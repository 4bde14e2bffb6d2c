"""Per-query comparison of two bench.py outputs (e.g. r4 candidate vs the
r2/r3 reference records), with the >1.25x regression flag the round verdicts
use.

Usage:
    python scripts/bench_compare.py NEW.json OLD.json [--flag 1.25]

Accepts either a raw ``bench.py`` JSON line or the driver's wrapped
``BENCH_rN.json`` (whose last JSON object lives at the end of a ``tail``
string). Prints shared-query totals, the flagged regressions sorted worst
first, and the new/old-only query sets. Pure file analysis — never starts
Spark.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path


def load(path: str) -> dict:
    text = Path(path).read_text().strip()
    try:
        d = json.loads(text.splitlines()[-1])
    except json.JSONDecodeError:
        d = json.loads(text)
    if "queries" not in d and "tail" in d:
        # driver wrapper: the bench line is embedded at the end of `tail`
        m = re.search(r"\{\"metric\".*", d["tail"], re.S)
        if not m:
            sys.exit(f"{path}: no bench line found in driver tail")
        d = json.loads(m.group(0))
    return d


# r4 registry merges: the merged query's wall absorbs its components', so
# an honest old-side comparator is the SUM of the old components. Applied
# only when the old record still has the components un-merged.
MERGES = {
    "resample_1h_multi": ("resample_1h_multi", "resample_custom_q90"),
    "doc_quality": ("doc_quality", "lang_id"),
    "coverage_info": ("coverage_info", "trend_ols"),
    "emb_neardup": ("emb_neardup_brute", "emb_neardup_lsh"),
    # r5 method-folds (oracle-window slot economy)
    "cusum_changepoint": ("cusum_changepoint", "counter_rate"),
    "dedup_ngram_jaccard": ("dedup_ngram_jaccard", "dedup_ngram_prefix"),
    "ann_cosine_topk": ("ann_cosine_topk", "ann_ivf_topk"),
    "series_corr": ("series_corr", "rolling_corr"),
}

# r4-late slots that gained NEW work (not an absorbed old query, so no old
# component exists to sum): a same-name wall increase here is the added
# algorithm, not a regression. Annotated in the flag output.
ADDED_WORK = {
    "series_corr": "+ per-series ACF (5 lags) + lagged CCF (2 signed lags)",
    "perplexity": "+ interpolated bigram-LM scoring",
    "cusum_changepoint": "+ Mann-Kendall + Sen's slope (Arrow kernel)"
                         " + KS split-drift test (window algebra)",
    "seasonal_anomaly": "+ classic additive decomposition (3 component rows/pt)",
    "vocab_topk": "+ per-source PSI drift + vocabulary JSD vs rest-of-corpus",
    "emb_dup_clusters": "+ SemDeDup cells (k-means fit + within-cell dedup)",
    "stratified_sample": "+ quality-weighted keep decisions (second hash pass)",
    "rollup_1m": "+ OHLC open partial + Σx³/Σx⁴ skew/kurt moments",
    "rollup_1h": "+ OHLC open partial + Σx³/Σx⁴ skew/kurt moments",
    "rollup_1d": "+ OHLC open partial + Σx³/Σx⁴ skew/kurt moments",
    "rollup_tiers": "+ OHLC open partial + Σx³/Σx⁴ skew/kurt moments",
    "smoother_backtest": "+ seasonal-naive baseline (5th method row)",
}


def _apply_merges(oq: dict, nq: dict) -> dict:
    out = dict(oq)
    for merged, parts in MERGES.items():
        # parts may or may not include the merged name itself (emb_neardup
        # is a pure rename-union; the others absorb into an existing name)
        if merged in nq and all(p in out for p in parts):
            total = sum(out.pop(p) for p in parts)
            total += out.pop(merged, 0.0) if merged not in parts else 0.0
            out[merged] = total
    return out


def main() -> None:
    # consume --flag (and its space-separated value) BEFORE collecting
    # positionals, so `--flag 1.5 NEW OLD` doesn't leak '1.5' into the
    # file list
    argv, args, flag = sys.argv[1:], [], 1.25
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--flag"):
            if "=" in a:
                flag = float(a.split("=", 1)[1])
            else:
                flag = float(argv[i + 1])
                i += 1
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    if len(args) != 2:
        sys.exit(__doc__.strip().splitlines()[0] + "\nusage: bench_compare.py"
                 " NEW.json OLD.json [--flag 1.25]")
    new, old = load(args[0]), load(args[1])
    nq, oq = new["queries"], old["queries"]
    oq = _apply_merges(oq, nq)
    shared = sorted(set(nq) & set(oq))
    ns, os_ = sum(nq[k] for k in shared), sum(oq[k] for k in shared)
    print(f"shared {len(shared)} queries: new {ns:.1f}s  old {os_:.1f}s  ratio {ns / os_:.3f}")
    print(f"health: new triad={new.get('host_triad_gbps')} probe={new.get('window_probe_sec')}"
          f"  old triad={old.get('host_triad_gbps')} probe={old.get('window_probe_sec')}")
    rows = sorted(((nq[k] / oq[k], k) for k in shared if oq[k] > 0), reverse=True)
    flagged = [(r, k) for r, k in rows if r > flag]
    print(f"\n>{flag}x regressions ({len(flagged)}):")
    for r, k in flagged:
        note = f"   [added work: {ADDED_WORK[k]}]" if k in ADDED_WORK else ""
        print(f"  {k:28s} {oq[k]:7.2f} -> {nq[k]:7.2f}  ({r:.2f}x){note}")
    improved = [(r, k) for r, k in rows if r < 1 / flag]
    print(f"\n>{flag}x improvements ({len(improved)}):")
    for r, k in improved[::-1]:
        print(f"  {k:28s} {oq[k]:7.2f} -> {nq[k]:7.2f}  ({r:.2f}x)")
    only_new, only_old = sorted(set(nq) - set(oq)), sorted(set(oq) - set(nq))
    if only_new:
        print(f"\nnew-only: {', '.join(only_new)}")
    if only_old:
        print(f"old-only: {', '.join(only_old)}")


if __name__ == "__main__":
    main()
