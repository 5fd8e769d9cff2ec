"""On-chip validation of the packed-gid GROUP BY at WIDE domains
(VERDICT r3 next #9 / r4 PACKED_MAX_GROUPS=2^26): exercises the packed
sort head both under the VMEM accumulator gate (segreduce kernel
engages) and past it (XLA segment ops take over while the sort keeps
its packed head), checking values against the DFTPU_PALLAS=0 oracle.

Usage: python scripts/validate_packed_wide.py [--rows N]
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("DFTPU_X64", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n: int, dom: int, pallas: str) -> dict:
    import datafusion_tpu as df

    os.environ["DFTPU_PALLAS"] = pallas
    rng = np.random.default_rng(9)
    k = rng.integers(0, dom, n).astype(np.int32)
    k[0] = 0
    k[1] = dom - 1  # pin the extremes so the probed range is the domain
    v = (rng.random(n, dtype=np.float32) * 100).astype(np.float32)
    ctx = df.ExecutionContext()
    ctx.register_table("t", df.Table.from_pydict({"k": k, "v": v}))
    res = ctx.sql(
        "SELECT k, COUNT(v), SUM(v), MIN(v) FROM t GROUP BY k ORDER BY k"
    )
    explain = ctx.sql(
        "EXPLAIN VERBOSE SELECT k, COUNT(v), SUM(v), MIN(v) FROM t "
        "GROUP BY k ORDER BY k"
    ).result_str()
    strat = [l for l in explain.splitlines() if "aggregate:" in l]
    rows = res.to_pylist()
    return {"rows": rows, "strategy": strat, "n_groups": len(rows)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 23)  # 8.4M
    args = ap.parse_args()
    n = args.rows

    # domains: 2^19 (kernel engages under the VMEM gate), 2^22 (r3 cap,
    # past the gate -> XLA fallback under the packed head), 5M sparse
    # (r4 headroom, Q3-orderkey-shaped)
    for dom in (1 << 19, 1 << 22, 5_000_000):
        ref = run(n, dom, "0")
        got = run(n, dom, "1")
        assert got["n_groups"] == ref["n_groups"], (
            dom, got["n_groups"], ref["n_groups"]
        )
        bad = 0
        for a, b in zip(got["rows"], ref["rows"]):
            if a["k"] != b["k"] or a["COUNT"] != b["COUNT"]:
                raise AssertionError((dom, a, b))
            sa, sb = float(a["SUM"]), float(b["SUM"])
            if abs(sa - sb) > 1e-3 * max(1.0, abs(sb)):
                bad += 1
            if float(a["MIN"]) != float(b["MIN"]):
                raise AssertionError((dom, "MIN", a, b))
        assert bad == 0, f"dom={dom}: {bad} SUM mismatches"
        print(
            f"dom={dom}: OK ({got['n_groups']} groups; "
            f"{'; '.join(got['strategy'][:1])})",
            flush=True,
        )
    print("ALL OK")


if __name__ == "__main__":
    main()
