"""ANN quality report: recall@k of LSH and IVF vs brute force at sf0.1,
plus candidate-pool sizes — the quality/cost numbers an ANN benchmark
publishes (the reference publishes none, BASELINE.md).

Usage: python tools/ann_quality.py [n_queries] [k]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from vector_database_api_spark.operators import ivf as ivf_mod
from vector_database_api_spark.operators import lsh as lsh_mod
from vector_database_api_spark.operators import pq as pq_mod
from vector_database_api_spark.operators.knn import knn_brute_force_blas
from vector_database_api_spark.session import get_spark
from vector_database_api_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ann-quality")

    embs = (
        load_table(spark, SF_DIR, "embeddings")
        .select(F.col("vec_id").cast("string").alias("id"), "embedding")
        .persist()
    )
    n = embs.count()

    planes = lsh_mod.generate_planes(64)
    lsh_index = lsh_mod.hash_table_df(embs, planes).persist()
    lsh_index.count()
    # tuned-for-64d variant: shorter hashes => bigger buckets => recall up
    planes_t = lsh_mod.generate_planes(64, hash_length=6)
    lsh_index_t = lsh_mod.hash_table_df(embs, planes_t).persist()
    lsh_index_t.count()
    ivf_index = ivf_mod.build_ivf(embs)
    ivf_index.index_df = ivf_index.index_df.persist()
    ivf_index.index_df.count()
    pq_index = pq_mod.build_pq(embs, m=8, k=16, seed=42)
    pq_index.codes_df = pq_index.codes_df.persist()
    pq_index.codes_df.count()
    # tuned: finer subspaces (dsub=2) lift recall at still-16x compression
    pq_index_t = pq_mod.build_pq(embs, m=32, k=16, seed=42)
    pq_index_t.codes_df = pq_index_t.codes_df.persist()
    pq_index_t.codes_df.count()
    from vector_database_api_spark.operators import sq as sq_mod

    sq_index = sq_mod.build_sq(embs)
    sq_index.codes_df = sq_index.codes_df.persist()
    sq_index.codes_df.count()
    # the SERVED trained-multiprobe layout (config.IVF_PROFILES
    # 'trained-p4': seeded KMeans nlist=20, nprobe=4) — the recall@2
    # number below is measured on the exact ivf_search path
    # service.py::search dispatches to for that profile
    ivf_p4 = ivf_mod.build_ivf(embs, nlist=20, nprobe=4)
    ivf_p4.index_df = ivf_p4.index_df.persist()
    ivf_p4.index_df.count()

    queries = embs.limit(n_queries).collect()
    lsh_hits = ivf_hits = lsh_t_hits = ivf_t_hits = pq_hits = pq_t_hits = pq_r_hits = sq_hits = total = 0
    served_p4_hits = served_p4_total = 0
    for row in queries:
        qvec = np.asarray(row["embedding"], dtype=np.float64)
        qdf = spark.createDataFrame(
            [([float(x) for x in row["embedding"]],)],
            "query_embedding array<float>",
        )
        truth = {
            r["id"]
            for r in knn_brute_force_blas(embs, qvec, k=k).collect()
        }
        lsh_res = {
            r["id"]
            for r in lsh_mod.lsh_search(
                embs, qdf, planes, k=k, index_df=lsh_index
            ).collect()
        }
        ivf_res = {
            r["id"]
            for r in ivf_mod.ivf_search(ivf_index, qdf, qvec, k=k).collect()
        }
        lsh_t_res = {
            r["id"]
            for r in lsh_mod.lsh_search(
                embs, qdf, planes_t, k=k, index_df=lsh_index_t
            ).collect()
        }
        ivf_t_res = {
            r["id"]
            for r in ivf_mod.ivf_search(
                ivf_index, qdf, qvec, k=k, nprobe=20
            ).collect()
        }
        pq_res = {
            r["id"] for r in pq_mod.pq_search(pq_index, qvec, k=k).collect()
        }
        pq_t_res = {
            r["id"] for r in pq_mod.pq_search(pq_index_t, qvec, k=k).collect()
        }
        pq_r_res = {
            r["id"]
            for r in pq_mod.pq_search_refined(
                pq_index, embs, qvec, k=k, refine=10
            ).collect()
        }
        sq_res = {
            r["id"] for r in sq_mod.sq_search(sq_index, qvec, k=k).collect()
        }
        truth2 = {
            r["id"] for r in knn_brute_force_blas(embs, qvec, k=2).collect()
        }
        served_p4 = {
            r["id"]
            for r in ivf_mod.ivf_search(ivf_p4, qdf, qvec, k=2).collect()
        }
        served_p4_hits += len(truth2 & served_p4)
        served_p4_total += len(truth2)
        lsh_hits += len(truth & lsh_res)
        ivf_hits += len(truth & ivf_res)
        lsh_t_hits += len(truth & lsh_t_res)
        ivf_t_hits += len(truth & ivf_t_res)
        pq_hits += len(truth & pq_res)
        pq_t_hits += len(truth & pq_t_res)
        pq_r_hits += len(truth & pq_r_res)
        sq_hits += len(truth & sq_res)
        total += len(truth)

    # kNN-join blocking recall: fraction of true top-2 neighbors (brute
    # force, all queries at once) that share the query's frozen-centroid
    # cluster — the approximation surface of knn_join_blocked_topk
    # (nprobe=1-style blocking; every vector is a query).
    from vector_database_api_spark.operators import dedup as ded
    from pyspark.sql import Window

    cents = embs.limit(20).select(
        F.col("id").alias("cluster_id"), F.col("embedding").alias("cvec")
    )
    assigned = ded.assign_clusters(embs, cents)  # (id, cluster_id)
    a = embs.select(F.col("id").alias("qid"), F.col("embedding").alias("qv"))
    b = embs.select(F.col("id").alias("nid"), F.col("embedding").alias("nv"))
    from vector_database_api_spark.functions.vector import cosine_similarity

    w = Window.partitionBy("qid").orderBy(
        F.desc("cos"), F.col("nid")
    )
    true_top2 = (
        a.crossJoin(b)
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", cosine_similarity("qv", "nv").alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("qid", "nid")
    )
    na = assigned.select(F.col("id").alias("nid"), F.col("cluster_id").alias("nc"))
    true_top2 = true_top2.persist()
    total_pairs = true_top2.count()

    def probe_recall(probes_df, neigh_assign, p: int) -> float:
        qp = probes_df.filter(F.col("probe_rank") <= p).select(
            F.col("id").alias("qid"), F.col("cluster_id").alias("qc")
        )
        found = (
            true_top2.join(qp, "qid")
            .join(neigh_assign, "nid")
            .filter(F.col("qc") == F.col("nc"))
            .select("qid", "nid")
            .distinct()
            .count()
        )
        return round(found / max(total_pairs, 1), 4)

    # multi-probe: a true neighbor is found iff its STORAGE cluster is
    # among the query's p nearest centroids (probe cost x p, storage x1)
    probes = ded.assign_clusters_topp(embs, cents, p=4, vec_col="embedding")
    block_recall = {p: probe_recall(probes, na, p) for p in (1, 2, 4)}
    knn_join_block_recall = block_recall[1]

    # same measurement with TRAINED centroids (seeded MLlib KMeans at the
    # same k=20) x multi-probe — the two levers composed: centroid
    # quality moves where vectors are STORED, multi-probe moves how many
    # cells each query READS; the recommended kNN-join layout is the
    # best (recall, probe-cost) point of this grid.
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    km_in = embs.select(
        "id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    km = KMeans(k=20, seed=42, maxIter=10).fit(km_in)
    trained_cents = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(km.clusterCenters())],
        "cluster_id int, cvec array<double>",
    )
    tassigned = ded.assign_clusters(embs, trained_cents)
    tna = tassigned.select(F.col("id").alias("nid"), F.col("cluster_id").alias("nc"))
    tprobes = ded.assign_clusters_topp(embs, trained_cents, p=8, vec_col="embedding")
    trained_block_recall = {
        p: probe_recall(tprobes, tna, p) for p in (1, 2, 4, 8)
    }
    true_top2.unpersist()

    print(
        json.dumps(
            {
                "n_vectors": n,
                "n_queries": n_queries,
                "k": k,
                "knn_join_block_recall_top2": knn_join_block_recall,
                "knn_join_block_recall_p2": block_recall[2],
                "knn_join_block_recall_p4": block_recall[4],
                "knn_join_block_recall_trained_k20": trained_block_recall[1],
                "knn_join_block_recall_trained_p2": trained_block_recall[2],
                "knn_join_block_recall_trained_p4": trained_block_recall[4],
                "knn_join_block_recall_trained_p8": trained_block_recall[8],
                "lsh_recall_ref_params": round(lsh_hits / total, 4),
                "ivf_recall_ref_params": round(ivf_hits / total, 4),
                "lsh_recall_hashlen6": round(lsh_t_hits / total, 4),
                "ivf_recall_nprobe20": round(ivf_t_hits / total, 4),
                "pq_recall_m8_k16": round(pq_hits / total, 4),
                "pq_recall_m32_k16": round(pq_t_hits / total, 4),
                "pq_recall_m8_refine10": round(pq_r_hits / total, 4),
                "sq8_recall": round(sq_hits / total, 4),
                "ivf_recall2_served_trained_p4": round(
                    served_p4_hits / max(served_p4_total, 1), 4
                ),
                "lsh_tables": len(planes),
                "ivf_nlist": ivf_index.nlist,
                "ivf_nprobe": ivf_index.nprobe,
            }
        )
    )


if __name__ == "__main__":
    main()
