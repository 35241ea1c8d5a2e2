"""Generate the hex5 grid-dimension fixture (VERDICT r5 'Next round' #1).

The corpus's geo spans live on the deterministic NY x NX MERRA2-style
lattice (synth.py LAT0/DLAT/LON0/DLON), so the (lat, lon) -> hex7 res-5
token map is a finite 7272-row dimension.  Writing it once as a parquet
fixture lets the DuckDB oracle JOIN the encode result the same way the
`hex_cells` fixture-literal pins its 48 tokens — turning `hex_rollup`
from a rows-only row into a full rows/schema/hash-checked one.

Run from the repo root:  python tools/gen_hex_fixture.py
tests/test_hexgrid.py re-derives every token with hex7_token_np and
pins a content hash, so a stale or tampered fixture fails the suite.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "geodata_spark", "resources", "hex5_grid_dim.parquet")


def build_frame():
    import numpy as np
    import pandas as pd

    from geodata_spark import hexgrid as HG
    from geodata_spark.synth import DLAT, DLON, LAT0, LON0, NX, NY

    yy, xx = np.meshgrid(np.arange(NY), np.arange(NX), indexing="ij")
    yy, xx = yy.ravel(), xx.ravel()
    lat = LAT0 + DLAT * yy.astype(np.float64)
    lon = LON0 + DLON * xx.astype(np.float64)

    def _tok(ids: np.ndarray) -> np.ndarray:
        out = np.empty(len(ids), dtype=object)
        for n, c in enumerate(ids):
            out[n] = format(int(c) & 0xFFFFFFFFFFFFFFFF, "016x")
        return out

    # parents derive from the res-5 encode by digit truncation — the
    # enforced "encode fine, then truncate" contract (hexgrid.py
    # hex7_parent_np docstring); a direct coarse encode would disagree
    # on ~1/3 of cells (inherent aperture-7 behavior)
    id5 = HG.hex7_id_np(lat, lon, 5)
    return pd.DataFrame(
        {
            "lat_idx": yy.astype(np.int64),
            "lon_idx": xx.astype(np.int64),
            "lat": lat,
            "lon": lon,
            "hex5": _tok(id5),
            "hex4": _tok(HG.hex7_parent_np(id5, 5, 4)),
            "hex3": _tok(HG.hex7_parent_np(id5, 5, 3)),
        }
    )


def content_hash(df) -> str:
    import hashlib

    lines = sorted(
        f"{r.lat_idx},{r.lon_idx},{r.hex5},{r.hex4},{r.hex3}"
        for r in df.itertuples()
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> None:
    df = build_frame()
    df.to_parquet(OUT, index=False)
    print(f"wrote {OUT}: {len(df)} rows, content md5 {content_hash(df)}")


if __name__ == "__main__":
    main()
