"""--biopsy: extract one VB's exact raw text for bug reproduction
(reference parity: src/biopsy.c biopsy_take :77 — advised on any recon
error)."""

import numpy as np

from .datatypes import detect, get
from .txtfile import TxtReader, DEFAULT_VB_SIZE


def biopsy_take(in_path: str, vb_n: int, dt_name=None,
                vb_size: int = DEFAULT_VB_SIZE) -> str:
    reader = TxtReader(in_path)
    head = reader.peek(64 * 1024)
    dt_name = dt_name or detect(in_path, head)
    dt = get(dt_name)()
    dt.read_txt_header(reader)
    out_path = f"{in_path}.vb{vb_n}"
    for i, data in enumerate(reader.vblocks(dt, vb_size), start=1):
        if i == vb_n:
            with open(out_path, "wb") as f:
                f.write(data.tobytes())
            reader.close()
            return out_path
    reader.close()
    raise ValueError(f"input has fewer than {vb_n} VBs")
