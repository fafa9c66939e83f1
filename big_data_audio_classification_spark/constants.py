"""Shared statistical constants.

Fixed critical values instead of CDF evaluations keep cross-engine
(Spark vs DuckDB oracle) arithmetic bit-identical — the module-docstring
determinism idiom used across the stats/timeseries/experiments families.
"""

from __future__ import annotations

# Two-sided 95% standard-normal critical value (Phi^-1(0.975)).
# Used by: diff-in-diff significance, bandit posterior CIs, power
# analysis, order-statistic median-CI rank bounds (experiments.py) and
# the Mann-Kendall trend classification (timeseries.py).
Z95_TWO_SIDED = 1.959963985
