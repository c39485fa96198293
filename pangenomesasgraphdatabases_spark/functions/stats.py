"""Statistical column math shared between Spark plans and DuckDB
oracles as SQL fragments — the same text compiles on both engines, so
both build the identical IEEE expression tree and the driver's exact
hash compare passes.

Covers the two-sample t machinery of the reference's RGP analysis
(RGPs.ipynb cell 19: scipy.stats.ttest_ind_from_stats with the default
equal_var=True, i.e. POOLED Student's t, nobs2 hardcoded to 5000).
"""

from __future__ import annotations

# --- two-sided p-value from (t, df) as a SQL fragment -----------------------
#
# 1. map t -> standard normal deviate with the classic large-df
#    transform  z = |t| (1 - 1/(4 df)) / sqrt(1 + t^2/(2 df)),
# 2. two-sided p = erfc(z / sqrt(2)) via the Abramowitz & Stegun
#    7.1.26 polynomial (|eps| <= 1.5e-7).
#
# Error vs the exact Student-t CDF is dominated by step 1 (measured in
# tests/test_functions.py against a betainc continued fraction):
# |p_approx - p_exact| < 2e-3 at df=10, < 2e-4 at df>=30, < 2e-5 at
# df>=100, < 2e-7 at df~5000.  The reference's df is nobs + 4998
# (nobs2 = 5000), deep inside the <1e-6 regime.  Both engines evaluate
# the identical fragment, so oracle parity is exact regardless of the
# approximation error.


def t_pvalue_sql(t: str, df: str) -> str:
    """Two-sided p-value fragment for t statistic `t` with `df` degrees
    of freedom (both SQL sub-expressions)."""
    zt = f"(abs({t}) * (1.0 - 1.0/(4.0*{df})) / sqrt(1.0 + {t}*{t}/(2.0*{df})))"
    x = f"({zt} / sqrt(2.0))"
    u = f"(1.0 / (1.0 + 0.3275911 * {x}))"
    poly = (
        f"(((((1.061405429*{u} - 1.453152027)*{u} + 1.421413741)*{u}"
        f" - 0.284496736)*{u} + 0.254829592)*{u})"
    )
    return f"({poly} * exp(-{x}*{x}))"


# Moments from exact accumulators (s = sum, ss = sum of squares,
# n = count; all DOUBLE casts of exact integer sums).
MOMENTS_SQL = [
    "s1/n1 AS m1",
    "s2/n2 AS m2",
    "(ss1 - s1*s1/n1)/(n1 - 1.0) AS v1",
    "(ss2 - s2*s2/n2)/(n2 - 1.0) AS v2",
]

# Pooled (scipy default equal_var=True — what the reference runs).
T_POOLED_SQL = (
    "(m1 - m2) / sqrt(((n1-1.0)*v1 + (n2-1.0)*v2)/(n1+n2-2.0)"
    " * (1.0/n1 + 1.0/n2))"
)
DF_POOLED_SQL = "(n1 + n2 - 2.0)"

# Welch (equal_var=False) with Welch–Satterthwaite df.
T_WELCH_SQL = "(m1 - m2) / sqrt(v1/n1 + v2/n2)"
DF_WELCH_SQL = (
    "((v1/n1 + v2/n2)*(v1/n1 + v2/n2)"
    " / ((v1/n1)*(v1/n1)/(n1-1.0) + (v2/n2)*(v2/n2)/(n2-1.0)))"
)


def z_pvalue_sql(z: str) -> str:
    """Two-sided p-value fragment for a standard-normal deviate `z`
    (a SQL sub-expression): p = erfc(|z|/sqrt(2)) via the same A&S
    7.1.26 polynomial as :func:`t_pvalue_sql` (|eps| <= 1.5e-7).
    Kept separate from the t path so the existing Welch fragments stay
    byte-identical (their driver hashes must not move)."""
    x = f"(abs({z}) / sqrt(2.0))"
    u = f"(1.0 / (1.0 + 0.3275911 * {x}))"
    poly = (
        f"(((((1.061405429*{u} - 1.453152027)*{u} + 1.421413741)*{u}"
        f" - 0.284496736)*{u} + 0.254829592)*{u})"
    )
    return f"({poly} * exp(-{x}*{x}))"


def t_pvalue_col(t, df):
    """Column-API twin of :func:`t_pvalue_sql` (same math, same
    constants) for plans built with pyspark Columns rather than SQL
    text.  `t` and `df` are pyspark Columns or column expressions."""
    from pyspark.sql import functions as F

    zt = F.abs(t) * (1.0 - 1.0 / (4.0 * df)) / F.sqrt(1.0 + t * t / (2.0 * df))
    x = zt / F.sqrt(F.lit(2.0))
    u = 1.0 / (1.0 + 0.3275911 * x)
    poly = (
        (((1.061405429 * u - 1.453152027) * u + 1.421413741) * u - 0.284496736)
        * u
        + 0.254829592
    ) * u
    return poly * F.exp(-x * x)
