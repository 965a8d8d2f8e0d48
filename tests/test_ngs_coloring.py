"""Randomized-coloring NGS study regression: the documented justification
for the Picard-count residual gap (reference SNES 'ngs' uses a randomized
greedy coloring whose draw the published CSVs don't record; see
`experiments/ordering_study.py::run_ngs_coloring_study` and
`results-conforming-2d/ordering/ngs_coloring.csv`).

The drand48 weight sequence is deterministic, so the re-draw counts are
exact regression pins. At N=128 the colored sweeps land within 1.2% of the
published 5135 (5155/5194 in the committed CSV)."""

import pytest

from perphil_tpu.experiments.ordering_study import ngs_coloring_case


@pytest.mark.parametrize(
    "N,weight,pattern,want_its,want_colors",
    [
        (4, "drand48", "values", 19, 10),
        (4, "drand48+deg", "values", 18, 9),
        (8, "drand48", "values", 57, 12),
        (8, "drand48+deg", "values", 56, 12),
    ],
)
def test_colored_ngs_counts_pinned(N, weight, pattern, want_its, want_colors):
    its, ncolors = ngs_coloring_case(N, weight, pattern)
    assert its == want_its
    assert ncolors == want_colors


def test_colored_ngs_brackets_reference():
    # reference petsc_perf_breakdown-with-picard.csv: 63 sweeps at N=8
    its, _ = ngs_coloring_case(8, "drand48", "full")
    assert abs(its - 63) / 63 < 0.15
