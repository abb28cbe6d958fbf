"""Ad-hoc sub-step profiler for the r14 optimization round.

Times named DataFrame thunks with the noop sink in ONE warm session
(guide §1.4/§1.5): each thunk is built fresh and run `reps` times; we
print per-run seconds so steal bursts are visible. Not part of the
bench contract — a scratch tool.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_essentials_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def run(spark, name, thunk, reps=2):
    spark.sparkContext.setJobDescription(name)
    out = []
    for _ in range(reps):
        s0, t0 = steal(), time.time()
        df = thunk()
        df.write.format("noop").mode("overwrite").save()
        out.append((time.time() - t0, (steal() - s0) / 100.0))
    spark.sparkContext.setJobDescription(None)
    print(
        f"{name:42s} "
        + "  ".join(f"{t:6.2f}s(st {s:4.1f})" for t, s in out),
        flush=True,
    )


def main() -> None:
    spark = get_spark("profile_r14")
    # warm: parquet reader + codegen + arrow workers
    from flink_essentials_spark.tables import load_tables

    t = load_tables(spark, SF_DIR)
    t["lineitem"].count()
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    which = sys.argv[1:] or ["chrf"]

    if "chrf" in which:
        from pyspark.sql import functions as F

        from flink_essentials_spark.queries.llmdata import CHRF_MAX_ORDER

        docs = t["documents"]
        chars = docs.select(
            "doc_id", F.regexp_replace(F.col("text"), r"\s+", "").alias("ch")
        )
        run(spark, "chrf:chars+checkpoint", lambda: chars)
        grams_all = (
            chars.select(
                "doc_id",
                F.explode(
                    F.array(*[F.lit(o) for o in range(1, CHRF_MAX_ORDER + 1)])
                ).alias("o"),
                "ch",
            )
            .select(
                "doc_id",
                "o",
                F.explode(
                    F.expr(
                        "CASE WHEN length(ch) >= o THEN transform("
                        "sequence(1, length(ch) - o + 1), "
                        "i -> substring(ch, i, o)) ELSE array() END"
                    )
                ).alias("g"),
            )
            .groupBy("doc_id", "o", "g")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        run(spark, "chrf:grams-all-docs", lambda: grams_all)
        from flink_essentials_spark.queries.llmdata import q_chrf_pairs

        run(spark, "chrf:full", lambda: q_chrf_pairs(spark, SF_DIR))

    if "hll" in which:
        from pyspark.sql import functions as F

        from flink_essentials_spark.functions import approx
        from flink_essentials_spark.functions.dedup import (
            _shingles,
            source_overlap,
        )

        docs = t["documents"]
        gs = (
            docs.select(
                F.col("source").alias("g"),
                F.explode(_shingles(F.col("text"), 3)).alias("shingle"),
            )
            .distinct()
        )
        run(spark, "hll:gs-distinct", lambda: gs)
        gs_cp = gs.localCheckpoint()
        regs = approx.hll_registers(
            gs_cp.select("g", F.col("shingle").alias("sh")), ["g"], "sh", p=8
        )
        run(spark, "hll:regs-from-gs", lambda: regs)
        regs_cp = regs.localCheckpoint()
        run(spark, "hll:pair-algebra", lambda: approx.hll_pair_algebra(regs_cp, p=8))
        run(spark, "hll:source-overlap-from-gs", lambda: source_overlap(docs, n=3, gs_df=gs_cp))
        from flink_essentials_spark.queries.llmdata import q_hll_set_ops

        run(spark, "hll:full", lambda: q_hll_set_ops(spark, SF_DIR))

    if "misc" in which:
        from flink_essentials_spark.queries.catalog import ALL_QUERIES

        for name in (
            "slope_one_devs",
            "bleu_pairs",
            "lpa_communities",
            "capped_sessions",
            "sw_alignment",
            "ppr_trade",
            "als_rmse",
            "dbscan_users",
            "greedy_coverage",
            "association_rules",
            "knn_hubness",
        ):
            run(spark, f"q:{name}", lambda n=name: ALL_QUERIES[n].fn(spark, SF_DIR))

    if "annsteps" in which:
        from pyspark.sql import functions as F

        from flink_essentials_spark.functions.graph import (
            boruvka_mst,
            hdbscan_condense,
            mr_edges_from_pairs,
        )
        from flink_essentials_spark.functions.similarity import (
            simhash_eps_pairs,
        )
        from flink_essentials_spark.queries.llmdata import (
            HDBSCAN_ANN_BITS,
            HDBSCAN_ANN_TABLES,
            HDBSCAN_EMBED_EPS2,
            HDBSCAN_EMBED_K,
            HDBSCAN_EMBED_MIN,
        )
        from flink_essentials_spark.tables import table_rows

        emb = t["embeddings"]
        canon = simhash_eps_pairs(
            emb,
            HDBSCAN_EMBED_EPS2,
            num_tables=HDBSCAN_ANN_TABLES,
            bits=HDBSCAN_ANN_BITS,
            n_rows_hint=table_rows(SF_DIR, "embeddings"),
        )
        run(spark, "annsteps:canon-single-task", lambda: canon)
        pairs = (
            canon.select(
                F.col("vec_a").alias("pid"), F.col("vec_b").alias("qid"), "d2"
            )
            .unionByName(
                canon.select(
                    F.col("vec_b").alias("pid"),
                    F.col("vec_a").alias("qid"),
                    "d2",
                )
            )
            .localCheckpoint()
        )
        core = (
            pairs.groupBy("pid")
            .agg(
                F.count(F.lit(1)).alias("n_eps"),
                F.sort_array(F.collect_list("d2")).alias("__ds"),
            )
            .filter(F.col("n_eps") >= HDBSCAN_EMBED_K - 1)
            .select(
                "pid",
                F.element_at("__ds", HDBSCAN_EMBED_K - 1)
                .cast("long")
                .alias("core2"),
            )
        )
        run(spark, "annsteps:core", lambda: core)
        mr = mr_edges_from_pairs(pairs, core)
        run(spark, "annsteps:mr-edges", lambda: mr)
        import time as _time

        t0 = _time.time()
        mst = boruvka_mst(mr)
        print(f"annsteps:boruvka-build(driver) {_time.time()-t0:.2f}s", flush=True)
        run(spark, "annsteps:mst-noop", lambda: mst)
        t0 = _time.time()
        cond = hdbscan_condense(mst, HDBSCAN_EMBED_MIN)
        print(f"annsteps:condense-build(driver) {_time.time()-t0:.2f}s", flush=True)
        run(spark, "annsteps:condense-noop", lambda: cond)

    if "ann" in which:
        from flink_essentials_spark.functions.similarity import (
            auto_blocks,
            euclid_eps_pairs,
            simhash_eps_pairs,
        )
        from flink_essentials_spark.queries.llmdata import (
            HDBSCAN_ANN_BITS,
            HDBSCAN_ANN_TABLES,
            HDBSCAN_EMBED_EPS2,
        )
        from flink_essentials_spark.tables import table_rows

        emb = t["embeddings"]
        run(
            spark,
            "ann:exact-eps-pairs",
            lambda: euclid_eps_pairs(
                emb,
                HDBSCAN_EMBED_EPS2,
                num_blocks=auto_blocks(table_rows(SF_DIR, "embeddings")),
            ),
        )
        run(
            spark,
            "ann:simhash-eps-pairs",
            lambda: simhash_eps_pairs(
                emb,
                HDBSCAN_EMBED_EPS2,
                num_tables=HDBSCAN_ANN_TABLES,
                bits=HDBSCAN_ANN_BITS,
            ),
        )
        from flink_essentials_spark.queries.catalog import ALL_QUERIES

        run(
            spark,
            "ann:hdbscan_embed_ann-full",
            lambda: ALL_QUERIES["hdbscan_embed_ann"].fn(spark, SF_DIR),
        )
        run(
            spark,
            "ann:hdbscan_embed-full",
            lambda: ALL_QUERIES["hdbscan_embed"].fn(spark, SF_DIR),
        )

    spark.stop()


if __name__ == "__main__":
    main()
