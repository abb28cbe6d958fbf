"""Dump explain('formatted') for the r15-touched batch queries.
Usage: python tools/dump_plans_r15.py <repo_root> <suffix>
(suffix = 'before' when run from the round-start worktree, 'after'
from the current tree; output always goes to the MAIN repo's
plans/r15/.)"""
import contextlib
import io
import os
import sys

root = sys.argv[1]
suffix = sys.argv[2]
sys.path.insert(0, root)
from flink_essentials_spark import get_spark  # noqa: E402

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
from flink_essentials_spark.queries.catalog import ALL_QUERIES  # noqa: E402

OUT = "/root/repo/plans/r15"
NAMES = [
    "ewma_anomaly", "spearman_trend", "kendall_tau", "chi2_terms",
    "heaps_fit", "ccnet_buckets", "rrf_fusion", "ndcg_eval",
    "gini_lengths", "length_percentiles", "ddsketch_quantiles",
    "dedup_clusters", "kneser_ney_lm", "dsir_weights",
    "lpa_communities", "capped_sessions",
    "exact_quantiles", "textrank_keywords", "cm_join_size",
    "psi_drift", "chi2_independence", "wavelet_synopsis",
    "welch_drift", "ks_drift", "mann_whitney", "decision_stump",
    "info_gain_stump", "degree_assortativity",
]
SF = "/root/testdata/sf0.001"
for n in NAMES:
    try:
        df = ALL_QUERIES[n].fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{n}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"OK {n}", file=sys.stderr)
    except Exception as e:
        print(f"ERR {n}: {e}", file=sys.stderr)
spark.stop()
