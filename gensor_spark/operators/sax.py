"""SAX: Symbolic Aggregate approXimation of series (Lin et al. 2003).

Shape-indexing extension of the PAA/DTW family (operators/dtw.py). A series
is z-normalized, PAA-reduced to ``w`` segments, and each segment mean is
mapped to one of ``alphabet_size`` symbols chosen so that symbols are
equiprobable under N(0,1) — the published Gaussian-breakpoint construction.
Identical words are motif/near-dup candidates; grouping by word is the
classic linear-shuffle index that avoids any pairwise comparison, and the
symbol distance admits the paper's MINDIST lower bound to DTW/Euclidean.

Shape at scale: ``paa_sketch`` is the only wide op (ONE shuffle on the
series key); the symbol mapping is a row-local pure-Catalyst fold over the
sketch array against a broadcast-literal breakpoint list (≤ 19 doubles), and
the word is a row-local char join. Grouping words for motif candidates is
one partial-agg shuffle on the word string.

Breakpoints are computed with Acklam's rational approximation of the
standard-normal quantile function (public constants, |error| < 1.2e-9) so
any alphabet size works without a scipy dependency; a=4 reproduces the
published table (-0.6745, 0, 0.6745) to 1e-9.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensor_spark.operators.dtw import KEYS, paa_sketch

#: symbols are letters a, b, c, ... (alphabet_size <= 20 per the paper's range)
_LETTERS = "abcdefghijklmnopqrst"


def _norm_ppf(p: float) -> float:
    """Acklam's inverse normal CDF approximation (|eps| < 1.2e-9)."""
    a = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00)
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0]*q+c[1])*q+c[2])*q+c[3])*q+c[4])*q+c[5]) / \
               ((((d[0]*q+d[1])*q+d[2])*q+d[3])*q+1)
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0]*q+c[1])*q+c[2])*q+c[3])*q+c[4])*q+c[5]) / \
               ((((d[0]*q+d[1])*q+d[2])*q+d[3])*q+1)
    q = p - 0.5
    r = q * q
    return (((((a[0]*r+a[1])*r+a[2])*r+a[3])*r+a[4])*r+a[5])*q / \
           (((((b[0]*r+b[1])*r+b[2])*r+b[3])*r+b[4])*r+1)


def sax_breakpoints(alphabet_size: int) -> list[float]:
    """The ``alphabet_size - 1`` equiprobable N(0,1) breakpoints."""
    if not 2 <= alphabet_size <= len(_LETTERS):
        raise ValueError(
            f"alphabet_size must be in [2, {len(_LETTERS)}], got {alphabet_size}")
    return [_norm_ppf(i / alphabet_size) for i in range(1, alphabet_size)]


def sax_words(
    points: DataFrame,
    w: int = 16,
    alphabet_size: int = 4,
    keys: tuple[str, ...] = KEYS,
    value_col: str = "value",
    order_col: str = "seq",
    min_points: int | None = None,
) -> DataFrame:
    """Per-series SAX word: ``(sid, n_points, symbols array<int>, word)``.

    ``w`` PAA segments (z-normalized — SAX is defined on normalized series),
    ``alphabet_size`` equiprobable symbols. Symbol ``i`` means the segment
    mean lies in ``[breakpoint[i-1], breakpoint[i])``; ``word`` renders the
    symbols as letters for direct groupBy indexing.
    """
    bps = sax_breakpoints(alphabet_size)
    sk = paa_sketch(points, length=w, keys=keys, value_col=value_col,
                    order_col=order_col, normalize=True,
                    min_points=min_points)
    bp_arr = F.array(*[F.lit(float(x)) for x in bps])
    symbols = F.transform(
        "sketch",
        # symbol = number of breakpoints <= segment mean (row-local fold
        # over a literal array; whole-stage codegen)
        lambda v: F.aggregate(
            bp_arr, F.lit(0),
            lambda acc, bp: acc + F.when(v >= bp, 1).otherwise(0)),
    )
    letters = F.array(*[F.lit(ch) for ch in _LETTERS[:alphabet_size]])
    return sk.select(
        "sid", "n_points",
        symbols.alias("symbols"),
        F.array_join(
            F.transform(symbols.cast("array<int>"),
                        lambda s: F.element_at(letters, s + 1)),
            "").alias("word"),
    )


def sax_motif_candidates(
    points: DataFrame,
    w: int = 16,
    alphabet_size: int = 4,
    min_group: int = 2,
    keys: tuple[str, ...] = KEYS,
    value_col: str = "value",
    order_col: str = "seq",
) -> DataFrame:
    """Series grouped by identical SAX word — motif / near-dup candidates.

    One partial-agg shuffle on the word; output is one row per word with
    ``n_series`` and the member ``sids`` (sorted for determinism). At web
    scale this is the linear-cost index that replaces all-pairs DTW; feed
    each group to ``dtw_pairs`` for exact verification.
    """
    words = sax_words(points, w, alphabet_size, keys, value_col, order_col)
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_series"),
             F.array_sort(F.collect_list("sid")).alias("sids"))
        .where(F.col("n_series") >= min_group)
    )
