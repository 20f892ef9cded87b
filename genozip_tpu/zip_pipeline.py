"""ZIP pipeline: compress one txt file into a GXZ archive.

Reference parity: src/zip.c:721 zip_one_file / :510 zip_compress_one_vb —
per-VB seg → deterministic in-order dict merge → per-context codec
auto-assignment (committed on first sight, src/codec.c:210) → section write;
global area (dicts, counts, file header) at the end, cf. zip.c:416
zip_write_global_area.
"""

import time
import zlib

import numpy as np

from . import codecs
from .codecs import assign as codec_assign
from .contexts import ZCtxGlobal, narrow_int
from .datatypes import detect, get
from .format import sections as fmt
from .txtfile import TxtReader, DEFAULT_VB_SIZE

FLAG_DELTA = 1  # local is delta-coded (param==1 contexts)


class ZipStats:
    def __init__(self):
        self.txt_len = 0
        self.z_len = 0
        self.num_vbs = 0
        self.num_lines = 0
        self.start = time.time()
        self.per_ctx = {}  # name -> [txt-ish bytes, z bytes]

    def add_section(self, name, uncomp, comp):
        e = self.per_ctx.setdefault(name, [0, 0])
        e[0] += uncomp
        e[1] += comp


def _b250_payload(b250_global: np.ndarray) -> np.ndarray:
    return narrow_int(b250_global)


def zip_file(in_path: str, out_path: str, dt_name: str | None = None,
             vb_size: int = DEFAULT_VB_SIZE, show_stats: bool = False,
             reference: str | None = None):
    reader = TxtReader(in_path)
    head = reader.peek(64 * 1024)
    dt_name = dt_name or detect(in_path, head)
    dt = get(dt_name)()
    ref_name = None
    if reference:
        from .ref.refstore import load_ref_file
        dt.ref = load_ref_file(reference)
        ref_name = reference.rsplit("/", 1)[-1]

    stats = ZipStats()
    out = open(out_path, "wb")
    zw = fmt.ZWriter(out)

    txt_header = dt.read_txt_header(reader)
    file_adler = zlib.adler32(b"")
    if txt_header:
        file_adler = zlib.adler32(txt_header, file_adler)
        codec = codec_assign.assign_best(txt_header, "text")
        zw.write_section(fmt.SEC_TXT_HEADER, txt_header, codec=codec, comp_i=0)
        stats.txt_len += len(txt_header)

    # segconf: sample-driven knobs (vb sizing, codec hints) — calibration pass
    dt.segconf_scan(np.frombuffer(head, dtype=np.uint8))

    gctxs: dict[str, ZCtxGlobal] = {}
    ra_index = {}

    vb_i = 0
    for data in reader.vblocks(dt, vb_size):
        vb_i += 1
        res = dt.seg_vb(data)

        # random-access index: per-VB chrom/pos ranges (reference
        # src/random_access.c random_access_merge_in_vb)
        cctx = res.ctxs.get("CHROM") or res.ctxs.get("RNAME")
        pctx = res.ctxs.get("POS")
        if cctx is not None and pctx is not None and \
                cctx.b250 is not None and pctx.local is not None:
            from . import regions as regions_mod
            pv = pctx.local
            if pctx.param == 1:
                pv = np.cumsum(pv)
            ents = regions_mod.ra_entries(cctx.vb_words, cctx.b250, pv)
            if ents:
                ra_index[str(vb_i)] = ents
        vb_adler = zlib.adler32(data.tobytes())
        file_adler = zlib.adler32(data.tobytes(), file_adler)
        stats.txt_len += data.shape[0]
        stats.num_vbs += 1
        stats.num_lines += res.num_lines

        ctx_meta = {}
        for name, c in res.ctxs.items():
            g = gctxs.get(name)
            if g is None:
                g = gctxs[name] = ZCtxGlobal(name)
            ctx_meta[name] = c.meta()
            if c.b250 is not None:
                counts = np.bincount(c.b250, minlength=len(c.vb_words))
                lut = g.merge_words(c.vb_words, counts)
                b250_g = lut[c.b250]
                payload_arr = _b250_payload(b250_g)
                payload = payload_arr.tobytes()
                if g.b250_codec is None:
                    g.b250_codec = codec_assign.assign_best(payload, "b250")
                ent = zw.write_section(
                    fmt.SEC_B250, payload, codec=g.b250_codec, vb_i=vb_i,
                    dict_id=name, ltype=fmt.lt_for_dtype(payload_arr.dtype))
                stats.add_section(name, int(c.b250.shape[0]), zw.offset - ent.offset)
            if c.local is not None:
                local = c.local
                if c.mode == "num":
                    local = narrow_int(local)
                payload = local.tobytes()
                if g.local_codec is None:
                    g.local_codec = codec_assign.assign_best(payload, c.cat)
                ent = zw.write_section(
                    fmt.SEC_LOCAL, payload, codec=g.local_codec, vb_i=vb_i,
                    dict_id=name, ltype=fmt.lt_for_dtype(local.dtype),
                    flags=FLAG_DELTA if c.param == 1 else 0)
                stats.add_section(name, len(payload), zw.offset - ent.offset)

        vb_hdr = {"n": res.num_lines, "len": int(data.shape[0]),
                  "adler": vb_adler, "ctxs": ctx_meta, "meta": res.meta}
        zw.write_section(fmt.SEC_VB_HEADER, fmt.json_payload(vb_hdr),
                         codec=codecs.ZLIB, vb_i=vb_i)

    # global area
    for name, g in gctxs.items():
        if g.words:
            payload = g.dict_payload()
            codec = codec_assign.assign_best(payload, "text")
            zw.write_section(fmt.SEC_DICT, payload, codec=codec, dict_id=name)
            cnt = np.asarray(g.counts, dtype="<u8").tobytes()
            zw.write_section(fmt.SEC_COUNTS, cnt,
                             codec=codec_assign.assign_best(cnt, "int"),
                             dict_id=name, ltype=fmt.LT_U64)

    if ra_index:
        zw.write_section(fmt.SEC_RANDOM_ACCESS, fmt.json_payload(ra_index),
                         codec=codecs.ZLIB)

    file_hdr = {
        "version": 1, "dt": dt_name, "num_vbs": vb_i,
        "num_lines": stats.num_lines, "txt_len": stats.txt_len,
        "adler": file_adler, "segconf": dt.segconf,
        "txt_name": in_path.rsplit("/", 1)[-1],
        "reference": ref_name,
    }
    zw.write_section(fmt.SEC_FILE_HEADER, fmt.json_payload(file_hdr),
                     codec=codecs.ZLIB)
    zw.finalize()
    out.close()
    reader.close()

    stats.z_len = zw.offset
    if show_stats:
        print_stats(stats, gctxs)
    return stats


def print_stats(stats: ZipStats, gctxs):
    dt_sec = time.time() - stats.start
    ratio = stats.txt_len / max(stats.z_len, 1)
    print(f"txt {stats.txt_len:,} -> z {stats.z_len:,}  ratio {ratio:.2f}x  "
          f"{stats.txt_len / 1e6 / max(dt_sec, 1e-9):.1f} MB/s  "
          f"vbs {stats.num_vbs} lines {stats.num_lines:,}")
    rows = sorted(stats.per_ctx.items(), key=lambda kv: -kv[1][1])
    for name, (u, z) in rows:
        print(f"  {name:12s} z {z:>12,}  ({100.0 * z / max(stats.z_len, 1):5.1f}%)")
