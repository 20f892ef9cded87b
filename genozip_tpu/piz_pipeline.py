"""PIZ pipeline: reconstruct the original txt file from a GXZ archive.

Reference parity: src/piz.c:880 piz_one_txt_file / :381 piz_reconstruct_one_vb
— read global area (dicts) once, then per-VB: read + uncompress context
sections, vectorized reconstruction by the datatype plugin, per-VB digest
verification, whole-file digest at the end (src/digest.c:244).
"""

import zlib

import numpy as np

from .contexts import PCtx, parse_dict_payload, MODE_DICT, MODE_NUM, MODE_TXT
from .datatypes import get
from .format import sections as fmt

FLAG_DELTA = 1


class PizReader:
    def __init__(self, z_path: str, reference: str | None = None):
        self.f = open(z_path, "rb")
        self.zr = fmt.ZReader(self.f)
        payload, _ = self.zr.read_one(fmt.SEC_FILE_HEADER)
        assert payload is not None, "missing file header"
        self.file_hdr = fmt.json_parse(payload)
        self.dt = get(self.file_hdr["dt"])(self.file_hdr.get("segconf") or {})
        if self.file_hdr.get("reference"):
            assert reference, (f"archive needs reference "
                               f"{self.file_hdr['reference']} (--reference)")
            from .ref.refstore import load_ref_file
            self.dt.ref = load_ref_file(reference)
        self.dicts = {}
        for ent in self.zr.sections(fmt.SEC_DICT):
            payload, meta = self.zr.read_section(ent)
            name = ent.dict_id.rstrip(b"\0").decode()
            self.dicts[name] = parse_dict_payload(payload)

    def txt_header(self) -> bytes:
        payload, _ = self.zr.read_one(fmt.SEC_TXT_HEADER)
        return payload or b""

    def num_vbs(self) -> int:
        return self.file_hdr["num_vbs"]

    def read_vb(self, vb_i: int) -> bytes:
        payload, _ = self.zr.read_one(fmt.SEC_VB_HEADER, vb_i=vb_i)
        vb_hdr = fmt.json_parse(payload)
        pctxs = {}
        for name, cm in vb_hdr["ctxs"].items():
            mode = cm["mode"]
            pc = PCtx(name, mode, param=cm.get("param", 0),
                      special=cm.get("special"))
            did = fmt.norm_dict_id(name)
            for ent in self.zr.sections(vb_i=vb_i):
                if ent.dict_id != did:
                    continue
                payload, meta = self.zr.read_section(ent)
                if ent.sec_type == fmt.SEC_B250:
                    pc.b250 = np.frombuffer(
                        payload, fmt.lt_dtype(meta["ltype"])).astype(np.int64)
                    pc.dict_col = self.dicts[name]
                elif ent.sec_type == fmt.SEC_LOCAL:
                    pc.local = np.frombuffer(payload, fmt.lt_dtype(meta["ltype"]))
                    pc.ltype = meta["ltype"]
            pctxs[name] = pc
        meta = dict(vb_hdr["meta"])
        meta["num_lines"] = vb_hdr["n"]
        out = self.dt.recon_vb(pctxs, meta)
        assert len(out) == vb_hdr["len"], \
            f"VB {vb_i}: length {len(out)} != {vb_hdr['len']}"
        assert zlib.adler32(out) == vb_hdr["adler"], f"VB {vb_i}: digest mismatch"
        return out

    def close(self):
        self.f.close()


def piz_file(z_path: str, out_path: str | None = None,
             verify_only: bool = False, reference: str | None = None):
    pr = PizReader(z_path, reference=reference)
    sink = None
    if out_path:
        if out_path.endswith((".gz", ".bgz", ".bam")):
            import gzip as _gzip
            sink = _gzip.open(out_path, "wb", compresslevel=6)
        else:
            sink = open(out_path, "wb")
    adler = zlib.adler32(b"")
    total = 0
    hdr = pr.txt_header()
    if hdr:
        adler = zlib.adler32(hdr, adler)
        total += len(hdr)
        if sink:
            sink.write(hdr)
    for vb_i in range(1, pr.num_vbs() + 1):
        out = pr.read_vb(vb_i)
        adler = zlib.adler32(out, adler)
        total += len(out)
        if sink:
            sink.write(out)
    assert total == pr.file_hdr["txt_len"], "file length mismatch"
    assert adler == pr.file_hdr["adler"], "file digest mismatch"
    if sink:
        sink.close()
    pr.close()
    return total
