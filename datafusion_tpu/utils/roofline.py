"""Speed-of-light roofline accounting per operator.

The reference had no performance tooling at all (SURVEY.md §5: only an
unused wall-clock timer). Here every operator's data movement can be
accounted against the chip's HBM bandwidth to report achieved fraction
of the roofline (BASELINE.md: scan/filter HBM-bound target ≥ 70%).
"""

from __future__ import annotations

from dataclasses import dataclass


# chip HBM bandwidth, GB/s (speed-of-light)
CHIP_HBM_GBPS = {
    "v4": 1228.0,
    "v5e": 819.0,
    "v5 lite": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
    "trillium": 1640.0,
}


def chip_hbm_gbps() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, bw in CHIP_HBM_GBPS.items():
        if key in kind:
            return bw
    return 819.0


@dataclass(frozen=True)
class OpCost:
    """Bytes moved by one operator invocation (reads + writes)."""

    name: str
    bytes_read: int
    bytes_written: int

    @property
    def bytes_total(self) -> int:
        return self.bytes_read + self.bytes_written


def filter_project_cost(n_rows: int, read_cols_bytes: int, written_cols_bytes: int) -> OpCost:
    """Fused scan→filter→project: reads the referenced columns, writes
    computed columns + 1-byte selection mask. Pass per-row byte widths."""
    return OpCost(
        "filter_project",
        n_rows * read_cols_bytes,
        n_rows * (written_cols_bytes + 1),
    )


def sort_cost(n_rows: int, row_bytes: int, passes: int = 1) -> OpCost:
    """A comparison sort moves all payload through HBM O(log n) times in
    theory; report per logical pass (lax.sort ≈ log-depth merge)."""
    return OpCost("sort", n_rows * row_bytes * passes, n_rows * row_bytes * passes)


def grouped_agg_cost(n_rows: int, key_bytes: int, agg_bytes: int) -> OpCost:
    """Sort-based grouped aggregation: one co-sort pass of keys+args plus
    one segmented-reduce read."""
    per_row = key_bytes + agg_bytes + 5  # +iota/selection overhead
    return OpCost("grouped_aggregate", n_rows * per_row * 2, n_rows * per_row)


def roofline_seconds(cost: OpCost, bw_gbps: float | None = None) -> float:
    bw = (bw_gbps or chip_hbm_gbps()) * 1e9
    return cost.bytes_total / bw


def achieved_fraction(cost: OpCost, measured_seconds: float, bw_gbps: float | None = None) -> float:
    return roofline_seconds(cost, bw_gbps) / max(measured_seconds, 1e-12)
