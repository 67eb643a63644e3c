"""Engine service layer — the reference's API lifecycle, Spark-native.

Mirrors the control flow of ``/root/reference/app/services/`` without the
HTTP shell (the REST surface is a thin façade, SURVEY §2.1 S12):

- ``SearchService.search_library``  (search_service.py:24-77): resolve the
  query embedding (text -> deterministic embedder, replacing the Cohere
  call at search_service.py:79-86), clamp k (config.py:62-68), dispatch to
  the library's index or brute-force fallback, filter-then-search.
- ``LibraryService.index_library``  (library_service.py:120-158): batch
  index build per (library, index_type), INSERT OVERWRITE of the index
  table, ``is_indexed`` flag.
- ``IndexManager._create_index``    (indexes.py:408-422): 'lsh' | 'ivf'
  dispatch; anything else (including the README's documented-but-invalid
  'flat') raises ValueError.

Storage: a warehouse directory of parquet tables —

    {warehouse}/chunks/                 partitioned by library_id
    {warehouse}/lsh_index/{library_id}/ (id, table_idx, hash)
    {warehouse}/ivf_index/{library_id}/ (id, cluster_id, embedding)
    {warehouse}/ivf_centroids/{library_id}.npy
    {warehouse}/pq_index/{library_id}/  (id, codes)           [extension]
    {warehouse}/pq_codebooks/{library_id}.npy                 [extension]
    {warehouse}/bm25_index/{library_id}/{postings,doclens,stats}  [extension]
    {warehouse}/hybrid_index/{library_id}/  (same three tables)   [extension]

Mutations are atomic directory overwrites (snapshot isolation — the
capability the reference gets from ReadWriteLock).  On a production
deployment these become Delta tables with MERGE; the operator layer
(operators/crud.py) is unchanged by that swap.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from vector_database_api_spark.config import (
    DEFAULT_CONFIG,
    IVF_PROFILES,
    LSH_PROFILES,
    EngineConfig,
)
from vector_database_api_spark.functions.embedding import make_embedder, text_to_vector
from vector_database_api_spark.operators import bm25 as bm25_mod
from vector_database_api_spark.operators import ivf as ivf_mod
from vector_database_api_spark.operators import lsh as lsh_mod
from vector_database_api_spark.operators import pq as pq_mod
from vector_database_api_spark.operators import presentation as pres_mod
from vector_database_api_spark.operators import rerank as rerank_mod
from vector_database_api_spark.operators import sq as sq_mod
from vector_database_api_spark.operators.knn import knn_brute_force

# reference parity: IndexManager accepts exactly lsh|ivf (indexes.py:408-422)
VALID_INDEX_TYPES = ("lsh", "ivf")
# engine extensions: product quantization (operators/pq.py), scalar
# quantization (operators/sq.py), a BM25 inverted index (operators/bm25.py)
# and the two-leg hybrid built on it — not in the reference; kept out of
# VALID_INDEX_TYPES so parity docs stay honest
ALL_INDEX_TYPES = VALID_INDEX_TYPES + ("pq", "sq8", "bm25", "hybrid")


class VectorEngine:
    """Library/document/chunk store + per-library ANN indexes."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        config: EngineConfig = DEFAULT_CONFIG,
    ) -> None:
        self.spark = spark
        self.warehouse = warehouse
        self.config = config
        self._embedder = make_embedder(config.embedding_dim)
        # per-request telemetry ring (search_timed / search_metrics_df)
        self._search_metrics: list[dict[str, Any]] = []
        os.makedirs(warehouse, exist_ok=True)

    # -- paths ---------------------------------------------------------

    def _chunks_dir(self) -> str:
        return os.path.join(self.warehouse, "chunks")

    def _index_dir(self, kind: str, library_id: str) -> str:
        return os.path.join(self.warehouse, f"{kind}_index", library_id)

    def _centroids_path(self, library_id: str) -> str:
        d = os.path.join(self.warehouse, "ivf_centroids")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{library_id}.npy")

    def _pq_codebooks_path(self, library_id: str) -> str:
        d = os.path.join(self.warehouse, "pq_codebooks")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{library_id}.npy")

    def _sq_bounds_path(self, library_id: str) -> str:
        d = os.path.join(self.warehouse, "sq_bounds")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{library_id}.npy")

    def _index_meta(self, library_id: str) -> tuple[str, str] | None:
        """(index_type, path) of the library's built index, if any."""
        for kind in ALL_INDEX_TYPES:
            path = self._index_dir(kind, library_id)
            if os.path.isdir(path):
                return kind, path
        return None

    def _lsh_planes(self, profile: dict[str, int] | None = None):
        """Hyperplanes for the given profile dict (num_tables/hash_length),
        falling back to the config defaults for missing keys."""
        params = profile or {}
        return lsh_mod.generate_planes(
            self.config.embedding_dim,
            num_tables=params.get("num_tables"),
            hash_length=params.get("hash_length"),
            config=self.config,
        )

    @staticmethod
    def _index_profile_at(path: str) -> dict[str, int] | None:
        """Geometry profile persisted with an index build — LSH plane
        shape or IVF nlist/nprobe (None for indexes written before
        profiles existed, or built from config defaults)."""
        import json

        meta = os.path.join(path, "_PROFILE.json")
        if os.path.exists(meta):
            with open(meta) as f:
                return json.load(f)
        return None

    # -- BM25 text-index storage (engine extension; operators/bm25.py) --

    @staticmethod
    def _write_text_index(
        base: str, postings: DataFrame, doclens: DataFrame, stats: DataFrame
    ) -> None:
        """Persist the three BM25 artifact tables.  Inputs may read from
        the directories being overwritten (mutation paths — and stats
        reads the doclens lineage), so ALL THREE are localCheckpoint-
        materialized BEFORE the first overwrite — the snapshot-isolation
        rule every other index mutation here follows."""
        snaps = [
            (df.localCheckpoint(), sub)
            for df, sub in (
                (postings, "postings"),
                (doclens, "doclens"),
                (stats, "stats"),
            )
        ]
        for snap, sub in snaps:
            snap.write.mode("overwrite").parquet(os.path.join(base, sub))

    @staticmethod
    def _bm25_stats_of(doclens: DataFrame) -> DataFrame:
        """The 1-row (n_docs, avgdl) corpus scalars from a doc-length
        table — the re-aggregation mutation paths run over the artifact."""
        return doclens.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )

    def _read_text_index(
        self, base: str
    ) -> tuple[DataFrame, DataFrame, int, float]:
        """(postings, doclens, n_docs, avgdl).  The 1-row stats read is
        bounded driver work — the corpus scalars of the BM25 formula."""
        postings = self.spark.read.parquet(os.path.join(base, "postings"))
        doclens = self.spark.read.parquet(os.path.join(base, "doclens"))
        row = self.spark.read.parquet(os.path.join(base, "stats")).first()
        n_docs = int(row["n_docs"]) if row is not None else 0
        avgdl = (
            float(row["avgdl"])
            if row is not None and row["avgdl"] is not None
            else 1.0
        )
        return postings, doclens, n_docs, avgdl

    @staticmethod
    def _write_index_profile(path: str, profile: dict[str, int] | None) -> None:
        """(Re)persist the geometry next to the index — Spark's overwrite
        wipes the directory, so mutation paths must put the marker back or
        search would hash/probe with the wrong layout."""
        import json

        if profile is not None:
            with open(os.path.join(path, "_PROFILE.json"), "w") as f:
                json.dump(profile, f)

    # -- ingestion (M1; chunk_service.py:22-54) ------------------------

    def ingest_chunks(self, rows: DataFrame) -> None:
        """Append chunk rows; NULL embeddings are filled by the
        deterministic embedder (reference embeds on create,
        chunk_service.py:31).  Partitioned by library_id so every
        library-scoped read prunes."""
        filled = rows.withColumn(
            "embedding",
            F.coalesce(F.col("embedding"), self._embedder(F.col("text"))),
        )
        filled.write.mode("append").partitionBy("library_id").parquet(
            self._chunks_dir()
        )

    def chunks(self, library_id: str | None = None) -> DataFrame:
        df = self.spark.read.parquet(self._chunks_dir())
        if library_id is not None:
            df = df.filter(F.col("library_id") == library_id)
        return df

    # -- index build (M4; library_service.py:120-158) ------------------

    def index_library(
        self,
        library_id: str,
        index_type: str = "lsh",
        lsh_profile: str = "reference",
        ivf_profile: str | None = None,
    ) -> None:
        """Deterministic full (re)build of the library's index table
        (IndexManager.rebuild_index, indexes.py:437-452) — INSERT OVERWRITE
        of a recompute from the chunks table.

        ``lsh_profile`` selects the LSH hash geometry from
        ``config.LSH_PROFILES`` ('reference' = the reference's L=8/k=12;
        'tuned' = hash_length 6, the measured recall profile for 64-d
        embeddings).  The profile is persisted next to the index so search
        hashes with the same planes.

        ``ivf_profile`` selects the IVF layout from ``config.IVF_PROFILES``;
        None keeps the engine-config nlist/nprobe (reference parity).
        'trained-p4' (KMeans k=20, 4 probes) is the measured RECOMMENDED
        serving layout — recall@2 0.59 on the ann_quality grid vs 0.25 at
        p=1 (PLANS.md); the geometry is persisted next to the index so
        search probes with the same layout."""
        if index_type == "lsh" and lsh_profile not in LSH_PROFILES:
            raise ValueError(f"Unknown LSH profile: {lsh_profile}")
        if (
            index_type == "ivf"
            and ivf_profile is not None
            and ivf_profile not in IVF_PROFILES
        ):
            raise ValueError(f"Unknown IVF profile: {ivf_profile}")
        if index_type not in ALL_INDEX_TYPES:
            # parity: reference raises on anything but lsh/ivf
            # (indexes.py:408-422; 'flat' in the README is invalid there too);
            # 'pq' is this engine's documented extension
            raise ValueError(f"Unknown index type: {index_type}")
        chunks = self.chunks(library_id).filter(F.col("embedding").isNotNull())
        if index_type in ("bm25", "hybrid"):
            # keyword inverted index (operators/bm25.py): postings +
            # doc lengths + 1-row corpus stats, each a parquet table
            # under the index dir.  'hybrid' stores the SAME artifact —
            # its vector leg scores chunks directly (exact top-k; an ANN
            # index would slot in as the leg at larger corpora).  NULL
            # text is excluded inside build_bm25_index, so build from
            # the unfiltered chunk set (text-bearing, not
            # embedding-bearing, rows feed the keyword leg).
            postings, doclens, stats = bm25_mod.build_bm25_index(
                self.chunks(library_id)
            )
            self._write_text_index(
                self._index_dir(index_type, library_id), postings, doclens, stats
            )
        elif index_type == "pq":
            index = pq_mod.build_pq(
                chunks, m=self.config.pq_m, k=self.config.pq_k, seed=self.config.seed
            )
            index.codes_df.write.mode("overwrite").parquet(
                self._index_dir("pq", library_id)
            )
            np.save(self._pq_codebooks_path(library_id), index.codebooks)
        elif index_type == "sq8":
            sq_index = sq_mod.build_sq(chunks)
            sq_index.codes_df.write.mode("overwrite").parquet(
                self._index_dir("sq8", library_id)
            )
            np.save(
                self._sq_bounds_path(library_id),
                np.stack([sq_index.vmins, sq_index.vmaxs]),
            )
        elif index_type == "lsh":
            planes = self._lsh_planes(LSH_PROFILES[lsh_profile])
            lsh_dir = self._index_dir("lsh", library_id)
            lsh_mod.hash_table_df(chunks, planes).write.mode("overwrite").parquet(
                lsh_dir
            )
            self._write_index_profile(lsh_dir, LSH_PROFILES[lsh_profile])
        else:
            params = IVF_PROFILES.get(ivf_profile) if ivf_profile else None
            index = ivf_mod.build_ivf(
                chunks,
                config=self.config,
                nlist=params["nlist"] if params else None,
                nprobe=params["nprobe"] if params else None,
            )
            ivf_dir = self._index_dir("ivf", library_id)
            if index.trained:
                # partitioned by cluster_id: probe search = partition pruning
                index.index_df.write.mode("overwrite").partitionBy(
                    "cluster_id"
                ).parquet(ivf_dir)
                np.save(self._centroids_path(library_id), index.centroids)
                self._write_index_profile(ivf_dir, params)
                marker = os.path.join(ivf_dir, "_UNTRAINED")
                if os.path.exists(marker):
                    os.remove(marker)
            else:
                # untrained (n < nlist): the library IS indexed but the index
                # is untrained — searches must return empty (reference lazy-
                # train gate, indexes.py:343-344), NOT fall back to brute force
                os.makedirs(ivf_dir, exist_ok=True)
                with open(os.path.join(ivf_dir, "_UNTRAINED"), "w") as f:
                    f.write("")
        # dropping the other index types mirrors index switching in the
        # reference tests (test_basic.py:244-268: lsh -> ivf -> lsh)
        for other in ALL_INDEX_TYPES:
            if other == index_type:
                continue
            other_dir = self._index_dir(other, library_id)
            if os.path.isdir(other_dir):
                import shutil

                shutil.rmtree(other_dir)

    # -- mutation maintenance (M2/M3; chunk_service.py:81-134) ---------

    def delete_chunks(self, library_id: str, chunk_ids: list[str]) -> None:
        """M3: remove chunks and their index rows (reference removes from
        index then storage, chunk_service.py:108-134).  Snapshot rewrite of
        the library partition + anti-join on the index table."""
        remaining = self.chunks(library_id).filter(~F.col("id").isin(chunk_ids))
        self._overwrite_library_chunks(library_id, remaining)
        meta = self._index_meta(library_id)
        if meta is not None:
            kind, path = meta
            if kind in ("bm25", "hybrid"):
                # drop the deleted ids from postings + doclens; corpus
                # stats (n_docs, avgdl) re-aggregate from the KEPT
                # doclens — artifact-sized work, never a corpus rescan
                postings, doclens, _, _ = self._read_text_index(path)
                kept_p = postings.filter(~F.col("id").isin(chunk_ids))
                kept_d = doclens.filter(~F.col("id").isin(chunk_ids))
                self._write_text_index(
                    path, kept_p, kept_d, self._bm25_stats_of(kept_d)
                )
            elif kind in ("lsh", "pq", "sq8"):
                profile = self._index_profile_at(path) if kind == "lsh" else None
                idx = self.spark.read.parquet(path)
                kept = idx.filter(~F.col("id").isin(chunk_ids)).localCheckpoint()
                kept.write.mode("overwrite").parquet(path)
                if kind == "lsh":
                    self._write_index_profile(path, profile)
            elif not os.path.exists(os.path.join(path, "_UNTRAINED")):
                profile = self._index_profile_at(path)
                idx = self.spark.read.parquet(path)
                kept = idx.filter(~F.col("id").isin(chunk_ids)).localCheckpoint()
                kept.write.mode("overwrite").partitionBy("cluster_id").parquet(path)
                self._write_index_profile(path, profile)

    def update_chunk_texts(self, library_id: str, patches: dict[str, str]) -> None:
        """M2: text update => re-embed + remove-then-add in the index
        (chunk_service.py:81-98).  The updated rows get fresh deterministic
        embeddings; index rows for those ids are recomputed."""
        ids = list(patches)
        mapping = F.create_map(
            *[F.lit(x) for kv in patches.items() for x in kv]
        )
        updated = (
            self.chunks(library_id)
            .withColumn(
                "text",
                F.when(F.col("id").isin(ids), mapping[F.col("id")]).otherwise(
                    F.col("text")
                ),
            )
            .withColumn(
                "embedding",
                F.when(
                    F.col("id").isin(ids), self._embedder(F.col("text"))
                ).otherwise(F.col("embedding")),
            )
        )
        self._overwrite_library_chunks(library_id, updated)
        meta = self._index_meta(library_id)
        if meta is not None:
            kind, path = meta
            if kind in ("bm25", "hybrid"):
                # remove-then-add on the keyword artifact: fresh postings/
                # doclens for just the patched rows, stats re-aggregated
                # from the merged doclens (artifact-sized, no corpus scan)
                changed = self.chunks(library_id).filter(F.col("id").isin(ids))
                new_p, new_d, _ = bm25_mod.build_bm25_index(changed)
                postings, doclens, _, _ = self._read_text_index(path)
                merged_p = postings.filter(~F.col("id").isin(ids)).unionByName(
                    new_p
                )
                merged_d = doclens.filter(~F.col("id").isin(ids)).unionByName(
                    new_d
                )
                self._write_text_index(
                    path, merged_p, merged_d, self._bm25_stats_of(merged_d)
                )
            elif kind == "pq":
                # re-encode with FROZEN codebooks (like IVF's frozen
                # centroids: incremental adds never retrain)
                codebooks = np.load(self._pq_codebooks_path(library_id))
                changed = self.chunks(library_id).filter(F.col("id").isin(ids))
                fresh = pq_mod.encode_codes(changed, codebooks)
                idx = self.spark.read.parquet(path)
                merged = (
                    idx.filter(~F.col("id").isin(ids)).unionByName(fresh)
                ).localCheckpoint()
                merged.write.mode("overwrite").parquet(path)
            elif kind == "sq8":
                # re-encode with FROZEN per-dim bounds (out-of-range
                # coordinates clamp into the trained range)
                vmins, vmaxs = np.load(self._sq_bounds_path(library_id))
                changed = self.chunks(library_id).filter(F.col("id").isin(ids))
                fresh = sq_mod.encode_with_bounds(changed, vmins, vmaxs)
                idx = self.spark.read.parquet(path)
                merged = (
                    idx.filter(~F.col("id").isin(ids)).unionByName(fresh)
                ).localCheckpoint()
                merged.write.mode("overwrite").parquet(path)
            elif kind == "lsh":
                profile = self._index_profile_at(path)
                planes = self._lsh_planes(profile)
                idx = self.spark.read.parquet(path)
                fresh = lsh_mod.hash_table_df(
                    self.chunks(library_id).filter(F.col("id").isin(ids)), planes
                )
                merged = (
                    idx.filter(~F.col("id").isin(ids)).unionByName(fresh)
                ).localCheckpoint()
                merged.write.mode("overwrite").parquet(path)
                self._write_index_profile(path, profile)
            else:
                # IVF: assignment with the frozen centroids (the reference
                # never retrains once trained — SURVEY §7 risk 5)
                if os.path.exists(os.path.join(path, "_UNTRAINED")):
                    return
                profile = self._index_profile_at(path)
                centroids = np.load(self._centroids_path(library_id))
                changed = self.chunks(library_id).filter(F.col("id").isin(ids))
                fresh = ivf_mod.assign_to_centroids(changed, centroids)
                idx = self.spark.read.parquet(path)
                merged = (
                    idx.filter(~F.col("id").isin(ids)).unionByName(fresh)
                ).localCheckpoint()
                merged.write.mode("overwrite").partitionBy("cluster_id").parquet(path)
                self._write_index_profile(path, profile)

    def _overwrite_library_chunks(self, library_id: str, new_rows: DataFrame) -> None:
        """Atomic snapshot replace of ONE library partition.  Dynamic
        partition overwrite touches only the partitions present in
        ``new_rows`` (this library), leaving other libraries' data alone;
        localCheckpoint materializes the snapshot before the overwrite so
        the read and write of the same path never overlap."""
        snap = new_rows.localCheckpoint()
        if snap.rdd.isEmpty():
            # dynamic overwrite writes no partitions for an empty frame;
            # an emptied library must still lose its directory
            import shutil

            part_dir = os.path.join(
                self._chunks_dir(), f"library_id={library_id}"
            )
            if os.path.isdir(part_dir):
                shutil.rmtree(part_dir)
            return
        snap.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("library_id").parquet(self._chunks_dir())

    # -- search (search_service.py:24-153) -----------------------------

    def search(
        self,
        library_id: str,
        query_text: str | None = None,
        query_embedding: list[float] | None = None,
        k: int | None = None,
        metadata_filters: dict[str, Any] | None = None,
        similarity_threshold: float | None = None,
        mode: str = "or",
        ranking: str = "bm25",
        fusion: str = "rrf",
    ) -> DataFrame:
        """Filtered top-k search: index dispatch when built, brute-force
        fallback otherwise; k clamped to [1, max_k] with default
        (T2, config.py:62-68); k results are k *filtered* results.

        ``similarity_threshold`` (F7, reference app/config.py:37 — declared
        there but never applied): when set here or in the config, results
        below it are dropped AFTER top-k, so you get at most k results at
        or above the threshold (possibly fewer).  For a ``bm25`` index the
        threshold applies to the BM25 score (the path's native scale); for
        ``hybrid`` it applies to the fused doc's cosine similarity, so a
        keyword-only doc (no vector evidence) is dropped when a threshold
        is set.

        ``mode`` selects the keyword-index evaluation (bm25 index only —
        any other path raises on a non-default mode): ``"or"`` (default,
        disjunctive full scoring), ``"and"`` (conjunctive: only docs
        containing EVERY query term — registry twin
        ``bm25_conjunctive_topk``), ``"maxscore"`` (dynamic pruning,
        results identical to "or" by construction — registry twin
        ``bm25_maxscore_topk``, hash-proven lossless), ``"blockmax"``
        (Block-Max WAND: per-(term, block) bounds, a survivor subset of
        maxscore's, still identical results — registry twin
        ``bm25_blockmax_topk``).

        ``ranking`` selects the keyword scoring model (bm25 index only):
        ``"bm25"`` (default) or ``"ql"`` — Dirichlet-smoothed query
        likelihood (registry twin ``ql_dirichlet_topk``; served via the
        Lucene LMDirichlet decomposition in
        operators/bm25.py::ql_dirichlet_search).  The pruning modes
        ("maxscore"/"blockmax") are BM25-bound-specific and raise with
        ranking="ql"; "or"/"and" compose.

        ``fusion`` selects the hybrid-index leg combiner (hybrid index
        only — any other path raises on a non-default fusion):
        ``"rrf"`` (default, rank-only reciprocal-rank fusion, registry
        twin ``hybrid_rrf_fusion``), ``"linear"`` (0.6/0.4 weighted
        blend of min-max-normalized leg scores, twin
        ``hybrid_linear_fusion``) or ``"combmnz"`` (normalized score
        sum x legs-retrieving count, twin ``hybrid_combmnz_fusion``).
        The result schema follows the fusion's native columns."""
        meta = self._index_meta(library_id)
        kind = meta[0] if meta is not None else None
        if mode not in ("or", "and", "maxscore", "blockmax"):
            raise ValueError(
                "mode must be 'or', 'and', 'maxscore' or 'blockmax', "
                f"got '{mode}'"
            )
        if mode != "or" and kind != "bm25":
            raise ValueError(
                f"mode='{mode}' needs a built bm25 index, not '{kind}'"
            )
        if fusion not in ("rrf", "linear", "combmnz"):
            raise ValueError(
                f"fusion must be 'rrf', 'linear' or 'combmnz', got '{fusion}'"
            )
        if fusion != "rrf" and kind != "hybrid":
            raise ValueError(
                f"fusion='{fusion}' needs a built hybrid index, not '{kind}'"
            )
        self._check_ranking(ranking, mode, kind)
        if query_embedding is None and kind != "bm25":
            # bm25 is the one path that never needs a vector; everything
            # else resolves text -> deterministic embedding up front
            if query_text is None:
                raise ValueError("query must have text or embedding")
            query_embedding = [
                float(x)
                for x in text_to_vector(query_text, self.config.embedding_dim)
            ]
        k = self.config.clamp_k(k)
        if similarity_threshold is None:
            similarity_threshold = self.config.similarity_threshold
        chunks = self.chunks(library_id)

        if kind == "bm25":
            if query_text is None:
                raise ValueError("a bm25 index searches by query_text")
            result = self._bm25_topk(
                meta[1], chunks, query_text, k, metadata_filters, mode=mode,
                ranking=ranking,
            )
            return self._apply_threshold(
                result, similarity_threshold, score_col="score"
            )

        query = self.spark.createDataFrame(
            [(query_embedding,)], "query_embedding array<float>"
        )

        if kind == "hybrid":
            return self._hybrid_topk(
                meta[1],
                chunks,
                query,
                query_text,
                k,
                metadata_filters,
                similarity_threshold,
                fusion=fusion,
            )

        if meta is None:
            return self._apply_threshold(
                knn_brute_force(
                    chunks, query, k=k, metadata_filters=metadata_filters
                ),
                similarity_threshold,
            )
        kind, path = meta
        if kind == "pq":
            from vector_database_api_spark.operators.filters import (
                apply_metadata_filters,
            )

            codebooks = np.load(self._pq_codebooks_path(library_id))
            codes_df = self.spark.read.parquet(path)
            if metadata_filters:
                filtered_ids = apply_metadata_filters(
                    chunks, metadata_filters
                ).select("id")
                codes_df = codes_df.join(filtered_ids, "id", "left_semi")
            index = pq_mod.PQIndex(
                codebooks=codebooks,
                codes_df=codes_df,
                m=codebooks.shape[0],
                k=codebooks.shape[1],
                dim=codebooks.shape[0] * codebooks.shape[2],
            )
            scored = pq_mod.pq_search(index, np.asarray(query_embedding, dtype=np.float64), k=k)
            # cosine -> euclidean on unit vectors: d = sqrt(2 - 2cos),
            # keeping the service result schema (id, similarity, distance)
            return self._apply_threshold(
                scored.withColumn(
                    "distance",
                    F.sqrt(
                        F.greatest(F.lit(2.0) - 2.0 * F.col("similarity"), F.lit(0.0))
                    ),
                ),
                similarity_threshold,
            )
        if kind == "sq8":
            from vector_database_api_spark.operators.filters import (
                apply_metadata_filters,
            )

            vmins, vmaxs = np.load(self._sq_bounds_path(library_id))
            codes_df = self.spark.read.parquet(path)
            if metadata_filters:
                filtered_ids = apply_metadata_filters(
                    chunks, metadata_filters
                ).select("id")
                codes_df = codes_df.join(filtered_ids, "id", "left_semi")
            sq_index = sq_mod.SQIndex(
                vmins=vmins, vmaxs=vmaxs, codes_df=codes_df, dim=len(vmins)
            )
            scored = sq_mod.sq_search(
                sq_index, np.asarray(query_embedding, dtype=np.float64), k=k
            )
            return self._apply_threshold(
                scored.withColumn(
                    "distance",
                    F.sqrt(
                        F.greatest(F.lit(2.0) - 2.0 * F.col("similarity"), F.lit(0.0))
                    ),
                ),
                similarity_threshold,
            )
        if kind == "lsh":
            planes = self._lsh_planes(self._index_profile_at(path))
            index_df = self.spark.read.parquet(path)
            return self._apply_threshold(
                lsh_mod.lsh_search(
                    chunks,
                    query,
                    planes,
                    k=k,
                    metadata_filters=metadata_filters,
                    index_df=index_df,
                ),
                similarity_threshold,
            )
        if os.path.exists(os.path.join(path, "_UNTRAINED")):
            return self.spark.createDataFrame([], ivf_mod.RESULT_SCHEMA)
        centroids = np.load(self._centroids_path(library_id))
        # probe with the layout the index was BUILT with (the persisted
        # profile — e.g. the measured 'trained-p4' serving layout);
        # config values remain the reference-parity fallback
        ivf_params = self._index_profile_at(path) or {}
        index = ivf_mod.IVFIndex(
            centroids=centroids,
            index_df=self.spark.read.parquet(path),
            trained=True,
            nlist=ivf_params.get("nlist", self.config.ivf_nlist),
            nprobe=ivf_params.get("nprobe", self.config.ivf_nprobe),
        )
        return self._apply_threshold(
            ivf_mod.ivf_search(
                index,
                query,
                np.asarray(query_embedding, dtype=np.float64),
                k=k,
                chunks=chunks,
                metadata_filters=metadata_filters,
            ),
            similarity_threshold,
        )

    @staticmethod
    def _apply_threshold(
        result: DataFrame,
        threshold: float | None,
        score_col: str = "similarity",
    ) -> DataFrame:
        """F7 similarity threshold: post-top-k filter, so at most k results
        survive.  None = reference-parity no-op (its threshold is dead
        config, never applied).  ``score_col`` is the path's native score
        scale (cosine similarity for the vector paths, BM25 score for the
        keyword path); a NULL score never passes a set threshold."""
        if threshold is None:
            return result
        return result.filter(F.col(score_col) >= float(threshold))

    # -- per-request telemetry (reference parity: search_service.py:59-66
    # wraps every search in wall-clock ms and returns execution_time_ms on
    # the response; here the counters additionally ride the SAME job via
    # DataFrame.observe — the operators/quality.py pattern on the read
    # path, so telemetry never costs a second scan) --------------------

    SEARCH_METRICS_CAP = 1024  # bounded ring: a long-lived service must
    # not grow driver memory with request count

    def search_timed(
        self,
        library_id: str,
        query_text: str | None = None,
        query_embedding: list[float] | None = None,
        k: int | None = None,
        metadata_filters: dict[str, Any] | None = None,
        similarity_threshold: float | None = None,
        mode: str = "or",
        ranking: str = "bm25",
        fusion: str = "rrf",
    ) -> tuple[list, dict[str, Any]]:
        """``search()`` with the reference's per-request telemetry
        (``execution_time_ms``): dispatches identically, attaches an
        ``Observation`` (result count, best/worst score) to the same job,
        runs the action, and returns ``(rows, metrics)``.  Each request's
        metrics are also appended to a bounded in-memory log —
        :meth:`search_metrics_df` exposes it as a DataFrame so serving
        latency is QUERYABLE (percentiles, per-mode breakdowns), not just
        printable."""
        import time

        from pyspark.sql import Observation

        result = self.search(
            library_id,
            query_text=query_text,
            query_embedding=query_embedding,
            k=k,
            metadata_filters=metadata_filters,
            similarity_threshold=similarity_threshold,
            mode=mode,
            ranking=ranking,
            fusion=fusion,
        )
        score_col = self._score_column(result)
        obs = Observation()
        observed = result.observe(
            obs,
            F.count(F.lit(1)).alias("n_results"),
            F.max(F.col(score_col).cast("double")).alias("best_score"),
            F.min(F.col(score_col).cast("double")).alias("worst_score"),
        )
        t0 = time.perf_counter()
        rows = observed.collect()
        elapsed_ms = (time.perf_counter() - t0) * 1000.0
        metrics: dict[str, Any] = {
            "library_id": library_id,
            "mode": mode,
            "ranking": ranking,
            "fusion": fusion,
            "execution_time_ms": round(elapsed_ms, 3),
            **obs.get,
        }
        self._search_metrics.append(metrics)
        if len(self._search_metrics) > self.SEARCH_METRICS_CAP:
            del self._search_metrics[: -self.SEARCH_METRICS_CAP]
        return rows, metrics

    def search_metrics_df(self) -> DataFrame:
        """The request-telemetry log as a DataFrame (newest last):
        (library_id, mode, ranking, fusion, execution_time_ms,
        n_results, best_score, worst_score) — aggregate it like any
        other table (p95 latency, per-mode means).  Bounded by
        SEARCH_METRICS_CAP requests."""
        schema = (
            "library_id string, mode string, ranking string, "
            "fusion string, execution_time_ms double, "
            "n_results bigint, best_score double, worst_score double"
        )
        return self.spark.createDataFrame(
            [
                (
                    m["library_id"],
                    m["mode"],
                    m.get("ranking", "bm25"),
                    m.get("fusion", "rrf"),
                    float(m["execution_time_ms"]),
                    int(m["n_results"]),
                    m["best_score"],
                    m["worst_score"],
                )
                for m in self._search_metrics
            ],
            schema,
        )

    # -- keyword + hybrid serving (engine extension; operators/bm25.py) -

    @staticmethod
    def _check_ranking(ranking: str, mode: str, kind: str | None) -> None:
        """Shared ranking-model validation for search()/search_after():
        "ql" needs a bm25 index and composes only with "or"/"and" (the
        pruning modes are BM25-bound-specific)."""
        if ranking not in ("bm25", "ql"):
            raise ValueError(f"ranking must be 'bm25' or 'ql', got '{ranking}'")
        if ranking == "ql":
            if kind != "bm25":
                raise ValueError(
                    f"ranking='ql' needs a built bm25 index, not '{kind}'"
                )
            if mode in ("maxscore", "blockmax"):
                raise ValueError(
                    "maxscore/blockmax pruning derives BM25 bounds; "
                    "use mode='or'/'and' with ranking='ql'"
                )

    def _bm25_topk(
        self,
        path: str,
        chunks: DataFrame,
        query_text: str,
        k: int,
        metadata_filters: dict[str, Any] | None,
        mode: str = "or",
        ranking: str = "bm25",
    ) -> DataFrame:
        """Filter-then-search BM25 top-k: metadata predicates restrict the
        CANDIDATES (semi-join of the filtered chunk ids into the postings)
        while per-term document frequency stays corpus-level from the
        stored index — k results are k filtered results, fewer allowed
        (reference search_service.py:88-110 semantics on the keyword
        leg).  ``mode``: "or" full scoring, "and" conjunctive, "maxscore"
        dynamic pruning, "blockmax" block-max pruning (both pruning
        modes return results identical to "or"; see
        operators/bm25.py::bm25_maxscore_search)."""
        from vector_database_api_spark.operators.filters import (
            apply_metadata_filters,
        )

        postings, doclens, n_docs, avgdl = self._read_text_index(path)
        cand = None
        if metadata_filters:
            cand = apply_metadata_filters(chunks, metadata_filters).select("id")
        terms = bm25_mod.tokenize_query(query_text)
        if ranking == "ql":
            return bm25_mod.ql_dirichlet_search(
                postings, doclens, float(n_docs) * float(avgdl), terms,
                k=k, candidate_ids=cand, operator=mode,
            )
        if mode in ("maxscore", "blockmax"):
            return bm25_mod.bm25_maxscore_search(
                postings, doclens, n_docs, avgdl, terms, k=k,
                candidate_ids=cand,
                n_blocks=bm25_mod.BLOCKMAX_BLOCKS if mode == "blockmax" else None,
            )
        return bm25_mod.bm25_search(
            postings,
            doclens,
            n_docs,
            avgdl,
            terms,
            k=k,
            candidate_ids=cand,
            operator=mode,
        )

    def _hybrid_topk(
        self,
        path: str,
        chunks: DataFrame,
        query: DataFrame,
        query_text: str | None,
        k: int,
        metadata_filters: dict[str, Any] | None,
        similarity_threshold: float | None,
        fusion: str = "rrf",
    ) -> DataFrame:
        """Two-leg hybrid search, reference filter-then-search semantics
        composed with the selected fusion: the metadata filter restricts
        BOTH legs BEFORE their top-k cuts, each leg is a distributed
        top-k (keyword: postings join; vector: exact cosine scan — the
        oracle-exact leg; an ANN index slots in here at larger corpora),
        and fusion runs over the two COLLECTED k-row legs — bounded O(k)
        coordinator work, constant in corpus size (the fusion locus of
        every real hybrid engine; the registry twins
        ``hybrid_rrf_filtered`` / ``hybrid_linear_fusion`` /
        ``hybrid_combmnz_fusion`` oracle-check the same combiners).
        Offering all three fusion modes costs ZERO extra corpus work:
        legs are computed once per request, only the O(k) combiner
        differs.  Without ``query_text`` the keyword leg is empty and
        the result degrades to vector ranks — same contract, fewer
        signals.

        Returns the fusion's native columns plus ``similarity`` — rrf:
        (id, r_kw, r_vec, rrf, ...); linear: (id, n_kw, n_vec, fused,
        ...); combmnz: (id, hits, combmnz, ...).  ``similarity`` is the
        doc's cosine when it appeared in the vector leg (NULL for
        keyword-only docs, which a set threshold therefore drops)."""
        vec_leg = knn_brute_force(
            chunks, query, k=k, metadata_filters=metadata_filters
        ).select("id", "similarity")
        if query_text is not None:
            kw_leg = self._bm25_topk(
                path, chunks, query_text, k, metadata_filters
            )
            # both legs collect CONCURRENTLY (operators/bm25.py) — the
            # fan-out a real hybrid engine does; wall-clock max(legs)
            kw_rows, vec_rows = bm25_mod.collect_parallel(kw_leg, vec_leg)
        else:
            kw_rows, vec_rows = [], vec_leg.collect()
        kw_pairs = [(r["id"], r["score"]) for r in kw_rows]
        vec_pairs = [(r["id"], r["similarity"]) for r in vec_rows]
        sims = {r["id"]: float(r["similarity"]) for r in vec_rows}
        if fusion == "rrf":
            fused = bm25_mod.rrf_fuse(kw_pairs, vec_pairs)
            rows = [
                (d, rk, rv, raw, sims.get(d))
                for d, rk, rv, raw in fused[: int(k)]
            ]
            schema = (
                "id string, r_kw int, r_vec int, rrf double, "
                "similarity double"
            )
        elif fusion == "linear":
            fused = bm25_mod.linear_fuse(kw_pairs, vec_pairs)
            rows = [
                (d, nk, nv, raw, sims.get(d))
                for d, nk, nv, raw in fused[: int(k)]
            ]
            schema = (
                "id string, n_kw double, n_vec double, fused double, "
                "similarity double"
            )
        else:
            fused = bm25_mod.combmnz_fuse(kw_pairs, vec_pairs)
            rows = [
                (d, h, raw, sims.get(d)) for d, h, raw in fused[: int(k)]
            ]
            schema = "id string, hits int, combmnz double, similarity double"
        out = self.spark.createDataFrame(rows, schema)
        return self._apply_threshold(out, similarity_threshold)

    def _batch_request_inputs(
        self, requests: list[tuple[str | None, list[float] | None]]
    ) -> tuple[list[list[str]], DataFrame]:
        """Shared validation + featurization for batched request lists
        (:meth:`search_hybrid_batch`, :meth:`export_ltr_features`):
        rejects empty lists and (None, None) requests (per-request
        parity with :meth:`search` — never silently embed the empty
        string), tokenizes the keyword legs, resolves missing
        embeddings via the deterministic embedder, and returns
        ``(term_lists, qdf)`` with ``qdf = (qid, query_embedding,
        _qn2)`` — the query norm staged ONCE per request, not once per
        (chunk, request) pair (the knn_brute_force discipline)."""
        from vector_database_api_spark.functions.vector import norm2

        if not requests:
            raise ValueError("requests must be non-empty")
        for i, (t, e) in enumerate(requests):
            if t is None and e is None:
                raise ValueError(
                    f"request {i}: query must have text or embedding"
                )
        term_lists = [
            bm25_mod.tokenize_query(t) if t is not None else []
            for t, _ in requests
        ]
        vecs = [
            e
            if e is not None
            else [
                float(x)
                for x in text_to_vector(t, self.config.embedding_dim)
            ]
            for t, e in requests
        ]
        # reject non-finite embedding values AT INTAKE, per request:
        # since the dense legs batch through grouped_topk (r9), a NaN
        # similarity would fail the whole batch job mid-flight with an
        # opaque executor error — validate here so the caller learns
        # WHICH request is bad and no other request is affected by the
        # error path (the deterministic embedder is finite by
        # construction; this guards caller-supplied vectors)
        import math

        for qid, v in enumerate(vecs):
            # float(x) on a None/str element raises TypeError/ValueError,
            # not the documented per-request error — coerce under the
            # same contract so the caller always learns WHICH request is
            # bad (r9 ADVICE)
            try:
                ok = all(math.isfinite(float(x)) for x in v)
            except (TypeError, ValueError):
                ok = False
            if not ok:
                raise ValueError(
                    f"request {qid}: query embedding contains a "
                    "non-finite or non-numeric value"
                )
        qdf = self.spark.createDataFrame(
            [(qid, v) for qid, v in enumerate(vecs)],
            "qid int, query_embedding array<float>",
        ).select(
            "qid", "query_embedding", norm2("query_embedding").alias("_qn2")
        )
        return term_lists, qdf

    def _batch_dense_leg(
        self, scoped: DataFrame, qdf: DataFrame, k: int
    ) -> DataFrame:
        """(qid, id, similarity, r_vec <= k): every query vector on the
        ONE broadcast side against the scoped chunk embeddings — the
        same staged-norm cosine as knn_brute_force (bit-identical
        similarity).  The per-qid top-k cut is the skew-safe sharded
        reduce (`operators/skew.py::grouped_topk`), not a per-qid
        ranking window: the window form this replaced (r8 verdict)
        shuffled the WHOLE scored store into Q partitions and sorted
        each on one task; grouped_topk is row-identical (pinned by
        tests/test_skew.py and the per-request equality pins in
        tests/test_service.py)."""
        from vector_database_api_spark.functions.vector import (
            dot_product,
            norm2,
        )
        from vector_database_api_spark.operators.skew import grouped_topk

        staged = (
            scoped.filter(F.col("embedding").isNotNull())
            .crossJoin(F.broadcast(qdf))
            .select(
                "qid",
                "id",
                F.col("_qn2"),
                norm2("embedding").alias("_na2"),
                dot_product("embedding", "query_embedding").alias("_dot"),
            )
        )
        sim = (
            F.when(
                (F.col("_na2") == F.lit(0.0)) | (F.col("_qn2") == F.lit(0.0)),
                F.lit(0.0),
            )
            .otherwise(
                F.col("_dot") / (F.sqrt(F.col("_na2")) * F.sqrt(F.col("_qn2")))
            )
            .alias("similarity")
        )
        scored = staged.select("qid", "id", sim)
        # a chunk whose stored embedding has a NULL ELEMENT yields NULL
        # dot/norm and hence NULL similarity (the isNotNull filter above
        # only screens whole-array NULLs).  NULL similarity is
        # un-computable evidence, not a result: drop it BEFORE the
        # top-k (grouped_topk fails fast on NULL scores by contract —
        # and the old window form quietly ranked such chunks LAST,
        # surfacing them only when a library had fewer than k healthy
        # chunks, which was accident, not semantics)
        return grouped_topk(
            scored.filter(F.col("similarity").isNotNull()),
            "qid",
            "similarity",
            "id",
            int(k),
        ).select("qid", "id", "similarity", F.col("rank").alias("r_vec"))

    def search_hybrid_batch(
        self,
        library_id: str,
        requests: list[tuple[str | None, list[float] | None]],
        k: int | None = None,
        metadata_filters: dict[str, Any] | None = None,
        similarity_threshold: float | None = None,
    ) -> DataFrame:
        """A BATCH of hybrid requests as ONE Spark job — the serving
        twin of the oracle-checked registry query
        ``hybrid_batch_rrf_topk``: where :meth:`search` on a hybrid
        index fuses ONE request's two collected k-row legs at the
        coordinator, a batch makes the fusion itself data-parallel.
        The keyword legs run as one plan (``bm25_mod.bm25_batch_search``
        — a broadcast (qid, term) table against the stored postings,
        grouped_topk sharded top-k since r9), the vector legs as one
        broadcast of
        ALL query vectors against the chunk embeddings, and RRF is a
        (qid, id) FULL OUTER join of two <=k-row-per-qid rank frames
        plus a fused per-qid window.  No per-request work, no
        coordinator step; every window is qid-keyed with k rows of
        state per request.

        ``requests``: (query_text, query_embedding) pairs, 0-based qid
        by position.  Missing embeddings resolve via the deterministic
        embedder (as in :meth:`search`); a None query_text leaves that
        request's keyword leg empty (vector ranks only) — the same
        degradation contract as the single path.  ``metadata_filters``
        restrict BOTH legs of every request before their top-k cuts;
        ``similarity_threshold`` applies to fused docs' cosine evidence
        (keyword-only docs carry NULL similarity and are dropped when a
        threshold is set) — identical semantics to :meth:`search` on
        the hybrid path, pinned per-request equal to it in
        tests/test_service.py.

        Returns (qid, rank, id, r_kw, r_vec, rrf, similarity) with
        rank <= k per qid."""
        from pyspark.sql.window import Window

        from vector_database_api_spark.operators.filters import (
            apply_metadata_filters,
        )

        meta = self._index_meta(library_id)
        if meta is None or meta[0] != "hybrid":
            kind = meta[0] if meta is not None else None
            raise ValueError(
                f"search_hybrid_batch needs a built hybrid index, not '{kind}'"
            )
        term_lists, qdf = self._batch_request_inputs(requests)
        k = self.config.clamp_k(k)
        if similarity_threshold is None:
            similarity_threshold = self.config.similarity_threshold
        chunks = self.chunks(library_id)
        scoped = apply_metadata_filters(chunks, metadata_filters)

        # keyword legs: one plan over the stored postings; per-term df
        # stays corpus-level, candidates restrict scoring (the same
        # filter-then-search split as _bm25_topk)
        postings, doclens, n_docs, avgdl = self._read_text_index(meta[1])
        cand = scoped.select("id") if metadata_filters else None
        kwr = bm25_mod.bm25_batch_search(
            postings, doclens, n_docs, avgdl, term_lists, k=k,
            candidate_ids=cand,
        ).select("qid", "id", F.col("rank").alias("r_kw"))

        vr = self._batch_dense_leg(scoped, qdf, k)

        # data-parallel RRF: both legs are <=k rows per qid
        fused = kwr.join(vr, ["qid", "id"], "full_outer").select(
            "qid",
            "id",
            "r_kw",
            "r_vec",
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(bm25_mod.RRF_K) + F.col("r_kw")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(bm25_mod.RRF_K) + F.col("r_vec")),
                    F.lit(0.0),
                )
            ).alias("rrf"),
            "similarity",
        )
        wf = Window.partitionBy("qid").orderBy(F.desc("rrf"), "id")
        out = (
            fused.withColumn("rank", F.row_number().over(wf))
            .filter(F.col("rank") <= int(k))
            .select("qid", "rank", "id", "r_kw", "r_vec", "rrf", "similarity")
        )
        return self._apply_threshold(out, similarity_threshold)

    def export_ltr_features(
        self,
        library_id: str,
        requests: list[tuple[str | None, list[float] | None]],
        k_pool: int = 20,
        metadata_filters: dict[str, Any] | None = None,
    ) -> DataFrame:
        """Batched LTR TRAINING-DATA export — the SERVED twin of the
        registry query ``ltr_feature_matrix_batch``: for every request,
        the candidate pool is the union of the keyword top-``k_pool``
        and the dense top-``k_pool`` (the engine's two first-stage
        retrievers over the library's stored index), and each (qid,
        chunk) row carries the reranker-training features.  Requires a
        built 'bm25' or 'hybrid' index.

        Shapes (the batch discipline of :meth:`search_hybrid_batch`):
        the keyword legs are ONE `bm25_batch_search` plan over the
        stored postings; the dense legs are ONE broadcast of all query
        vectors against the scoped chunk embeddings; the full-outer
        pool (<= 2*k_pool per request) is collected ONCE — bounded
        driver data, and the only materialization of the two live leg
        plans — and the chunk store is probed with a broadcast
        semi-join on the pool's distinct ids for the text/embedding
        features (r8 verdict: the collected-ids ``isin()`` literal
        this replaced would compile a 400k-term IN expression at a
        10k-query log; the r9 registry twin goes further — fully
        in-plan — because ITS legs are persisted run artifacts that
        are cheap to reference twice).  Per-query term
        features are computed with the terms bound as LITERAL ARRAYS
        (the snippet-highlighting injection discipline — no query text
        is ever spliced into an expression string).

        Feature conventions (mirroring the oracle-checked registry
        twin): ``bm25`` comes from the keyword leg and is
        NULL for docs outside its top-``k_pool`` (run-file-censored
        evidence, as when exporting from stored runs); ``tf_sum`` /
        ``n_hit_terms`` / ``dl`` / ``cos_sim`` are computed EXACTLY for
        every pool row from the probed chunk text + embedding (0 is a
        real zero, not missing) — a pool row whose chunk lacks text or
        an embedding is DROPPED rather than exported with NULL "exact"
        features (the registry twin's inner-join semantics).
        ``k_pool`` is clamped through ``config.clamp_k`` like every
        search k, so the pool stays bounded by
        2*max_k*len(requests).  Returns (qid, id, r_kw, r_vec, bm25,
        n_hit_terms, dl, tf_sum, cos_sim, n_chars), ordered by
        (qid, id)."""
        from vector_database_api_spark.functions.vector import (
            cosine_similarity,
        )
        from vector_database_api_spark.operators.filters import (
            apply_metadata_filters,
        )

        meta = self._index_meta(library_id)
        if meta is None or meta[0] not in ("bm25", "hybrid"):
            raise ValueError(
                "export_ltr_features needs a built bm25 or hybrid index"
            )
        term_lists, qdf = self._batch_request_inputs(requests)
        k_pool = self.config.clamp_k(k_pool)
        scoped = apply_metadata_filters(
            self.chunks(library_id), metadata_filters
        )

        postings, doclens, n_docs, avgdl = self._read_text_index(meta[1])
        cand = scoped.select("id") if metadata_filters else None
        kw = bm25_mod.bm25_batch_search(
            postings, doclens, n_docs, avgdl, term_lists, k=k_pool,
            candidate_ids=cand,
        ).select(
            "qid",
            "id",
            F.col("score").alias("bm25"),
            F.col("rank").cast("long").alias("r_kw"),
        )

        vr = (
            self._batch_dense_leg(scoped, qdf, k_pool)
            .select("qid", "id", F.col("r_vec").cast("long").alias("r_vec"))
        )

        # kw and vr are LIVE plans referenced twice downstream (probe
        # semi-join + feature join), so the pool must materialize
        # exactly once — via persist(), never a driver round-trip (r9
        # verdict watch item: the "bounded" collect this replaces was
        # 2*k*Q rows THROUGH THE DRIVER — 2M rows at a 10k-query log
        # with k=100; persist() buys the same single materialization of
        # the corpus-scoring legs executor-side, and the count() below
        # is the 1-scalar action that forces it before either
        # reference).  The pool stays cached for the caller's
        # materialization of the returned frame; Spark evicts LRU, and
        # the <=2*k*Q cached rows are k-clamped.  The probe side is a
        # broadcast semi-join on the pool's distinct ids — never an
        # isin() literal (r8 verdict: a 400k-term IN expression at a
        # 10k-query log).
        # one-slot pool lifecycle: each call persists one pool, so a
        # long-lived engine would accumulate cached pools (the leak the
        # replaced driver collect did not have).  The previous call's
        # pool is unpersisted here — by which point its export is
        # either materialized or abandoned; an export frame held across
        # a LATER export call recomputes its legs if touched again,
        # the standard lazily-returned-frame contract.
        if getattr(self, "_ltr_pool", None) is not None:
            self._ltr_pool.unpersist()
        pool = kw.join(vr, ["qid", "id"], "full_outer").persist()
        self._ltr_pool = pool
        pool.count()
        pool_ids = pool.select("id").distinct()
        qterms = self.spark.createDataFrame(
            [(qid, ts) for qid, ts in enumerate(term_lists)],
            "qid int, terms array<string>",
        )
        feats = (
            self.chunks(library_id)
            .join(F.broadcast(pool_ids), "id", "left_semi")
            # exact-feature contract: a chunk without text or an
            # embedding cannot carry exact dl/tf/cos features — drop it
            # (the registry twin's inner-join semantics) instead of
            # exporting NULLs documented as real zeros
            .filter(
                F.col("text").isNotNull() & F.col("embedding").isNotNull()
            )
            .select(
                "id",
                F.expr("split(lower(text), ' ', -1)").alias("_toks"),
                "embedding",
                F.length("text").cast("long").alias("n_chars"),
            )
        )
        staged = (
            pool.join(F.broadcast(feats), "id")
            .join(F.broadcast(qterms), "qid")
            .join(F.broadcast(qdf), "qid")
        )
        return staged.select(
            "qid",
            "id",
            "r_kw",
            "r_vec",
            F.round("bm25", 6).alias("bm25"),
            # terms are a COLUMN (literal array), never spliced into
            # the expression text — hostile query terms cannot escape
            F.expr("size(filter(terms, t -> array_contains(_toks, t)))")
            .cast("long")
            .alias("n_hit_terms"),
            F.size("_toks").cast("long").alias("dl"),
            F.expr(
                "aggregate(terms, 0L, (acc, t) ->"
                " acc + size(filter(_toks, x -> x = t)))"
            )
            .cast("long")
            .alias("tf_sum"),
            F.round(
                cosine_similarity("embedding", "query_embedding"), 6
            ).alias("cos_sim"),
            "n_chars",
        ).orderBy("qid", "id")

    def evaluate_search(
        self,
        library_id: str,
        requests: list[tuple[str | None, list[float] | None]],
        qrels: list[tuple[int, str, int]],
        metadata_filters: dict[str, Any] | None = None,
    ) -> DataFrame:
        """Offline evaluation of the engine's OWN batched hybrid
        retrieval against caller-supplied relevance judgments — the
        serving twin of the oracle-checked registry pair
        `ir_eval_metrics` / `ir_eval_hybrid_metrics`, with the qrels as
        an input instead of corpus-derived: the relevance dashboard a
        team runs over its click/label logs after every index or
        fusion change.

        ``qrels``: (qid, chunk_id, rel) with rel graded 0-3 (0-rows may
        be omitted — an unjudged retrieved doc counts as rel 0, the
        trec_eval convention).  ``requests`` as in
        :meth:`search_hybrid_batch`; the run is that method's fused
        top-10.  Metrics per qid: nDCG@10 (graded 2^rel-1 gains),
        MRR@10, MAP@10 (cutoff-normalized by min(R, 10)), P@10,
        recall@10 — the exact fixed-order scalar expressions the
        registry suite hash-proves against DuckDB, evaluated over the
        <=10-row-per-qid run joined to the broadcast qrels.  Everything
        downstream of retrieval is k*Q-row work."""
        from vector_database_api_spark.queries import _IR_METRICS

        if not qrels:
            raise ValueError("qrels must be non-empty")
        for qid, _, rel in qrels:
            if not 0 <= int(rel) <= 3:
                raise ValueError(f"qrels rel must be 0-3, got {rel} (qid {qid})")
        run = self.search_hybrid_batch(
            library_id, requests, k=10, metadata_filters=metadata_filters
        )
        qdf = self.spark.createDataFrame(
            [(int(q), i, int(r)) for q, i, r in qrels],
            "qid int, id string, rel int",
        )
        # deduplicate to max grade per (qid, id) — duplicate judgment
        # rows would inflate the n_rel/n1/n2/n3 denominators (wrong
        # recall/MAP) and fan out the run join (r8 ADVICE); taking the
        # max grade is the lenient half of trec_eval's behavior (it
        # errors) and keeps repeated identical rows a no-op
        qdf = qdf.groupBy("qid", "id").agg(F.max("rel").alias("rel"))
        top = run.join(F.broadcast(qdf), ["qid", "id"], "left").select(
            "qid", "rank", F.coalesce(F.col("rel"), F.lit(0)).alias("rel")
        )
        pivoted = top.groupBy("qid").agg(
            *[
                F.max(F.when(F.col("rank") == r, F.col("rel"))).alias(
                    f"rel_{r}"
                )
                for r in range(1, 11)
            ]
        )
        grades = qdf.groupBy("qid").agg(
            F.sum(F.when(F.col("rel") == 3, 1).otherwise(0))
            .cast("long")
            .alias("n3"),
            F.sum(F.when(F.col("rel") == 2, 1).otherwise(0))
            .cast("long")
            .alias("n2"),
            F.sum(F.when(F.col("rel") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("rel") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_rel"),
        )
        # left join on grades: a request with no judged docs at all
        # still reports a row (all-zero metrics), matching trec_eval —
        # grade columns are zero-filled BEFORE the metric expressions
        # read them (a NULL n3 would NULL-poison nDCG's ideal gain)
        j = pivoted.join(grades, "qid", "left").select(
            "qid",
            *[f"rel_{r}" for r in range(1, 11)],
            *[
                F.coalesce(F.col(c), F.lit(0).cast("long")).alias(c)
                for c in ("n3", "n2", "n1", "n_rel")
            ],
        )
        return j.select(
            "qid",
            "n_rel",
            *[
                F.round(F.expr(expr), 6).alias(name)
                for name, expr in _IR_METRICS.items()
            ],
        ).orderBy("qid")

    def search_diversified(
        self,
        library_id: str,
        query_text: str | None = None,
        query_embedding: list[float] | None = None,
        k: int | None = None,
        metadata_filters: dict[str, Any] | None = None,
        lam: float = 0.7,
        one_minus_lam: float = 0.3,
        pool_factor: int = 4,
        mode: str = "or",
    ) -> DataFrame:
        """MMR-diversified top-k — the serving form of the oracle-checked
        `queries.py::mmr_diversified_topk`: fetch a relevance pool of
        min(pool_factor*k, max_k) through the library's regular search
        dispatch (any index path; filter-then-search applies to the
        pool), join the pool ids back to their embeddings, and run the
        shared greedy MMR (`operators/rerank.py`) over the COLLECTED
        pool — bounded O(pool²) coordinator work, constant in corpus
        size.  Relevance is the pool rows' cosine to the query vector,
        recomputed with the engines' exact sequential fold so the score
        scale matches the vector paths regardless of which index
        retrieved the pool.  Returns (mmr_rank, id, mmr, similarity),
        k rows (fewer if the filtered pool is smaller)."""
        from vector_database_api_spark.operators import rerank as rerank_mod

        if query_embedding is None:
            if query_text is None:
                raise ValueError("query must have text or embedding")
            query_embedding = [
                float(x)
                for x in text_to_vector(query_text, self.config.embedding_dim)
            ]
        k = self.config.clamp_k(k)
        pool_k = min(max(pool_factor * k, k), self.config.max_k)
        pool = self.search(
            library_id,
            query_text=query_text,
            query_embedding=query_embedding,
            k=pool_k,
            metadata_filters=metadata_filters,
            mode=mode,
        ).select("id")
        pool_vecs = (
            self.chunks(library_id)
            .join(pool, "id", "left_semi")
            .filter(F.col("embedding").isNotNull())
            .select("id", "embedding")
            .collect()
        )
        vec = {r["id"]: r["embedding"] for r in pool_vecs}
        rel = {
            i: rerank_mod.seq_cosine(v, query_embedding)
            for i, v in vec.items()
        }
        sim = rerank_mod.pairwise_cosines(vec)
        picked = rerank_mod.mmr_greedy(
            rel, sim, k=k, lam=lam, one_minus_lam=one_minus_lam
        )
        return self.spark.createDataFrame(
            [(rank, d, score, rel[d]) for rank, d, score in picked],
            "mmr_rank int, id string, mmr double, similarity double",
        )

    def facet_counts(
        self,
        library_id: str,
        keys: list[str],
        metadata_filters: dict[str, Any] | None = None,
    ) -> DataFrame:
        """Facet panel over the FILTERED candidate set (filter-then-facet
        — the counts a search UI renders next to filtered results): for
        each requested metadata key, how many candidate chunks carry each
        value.  One scan: the key list unrolls into a per-row explode of
        (key, value) structs, then a combinable (key, value) count —
        missing keys contribute nothing (MapType access is NULL).
        Returns (facet_key, facet_value, n_chunks) ordered for stable
        display."""
        from vector_database_api_spark.operators.filters import (
            apply_metadata_filters,
        )

        if not keys:
            raise ValueError("facet_counts needs at least one key")
        scoped = apply_metadata_filters(self.chunks(library_id), metadata_filters)
        pairs = scoped.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(key).alias("facet_key"),
                            F.col("metadata")[key].alias("facet_value"),
                        )
                        for key in keys
                    ]
                )
            ).alias("p")
        ).select("p.facet_key", "p.facet_value")
        return (
            pairs.filter(F.col("facet_value").isNotNull())
            .groupBy("facet_key", "facet_value")
            .agg(F.count(F.lit(1)).alias("n_chunks"))
            .orderBy("facet_key", F.desc("n_chunks"), "facet_value")
        )

    # -- result presentation (engine extension; operators/presentation.py,
    # operators/rerank.py) — the layers a production search engine adds on
    # top of the reference's raw top-k lists (search_service.py:112-153):
    # highlight snippets, per-key collapsing, dynamic-k autocut.

    @staticmethod
    def _score_column(result: DataFrame) -> str:
        """The native score column of a search result, per dispatch path:
        'score' (bm25), 'rrf'/'fused'/'combmnz' (hybrid, per fusion mode),
        else 'similarity' (vector)."""
        for c in ("score", "rrf", "fused", "combmnz", "similarity"):
            if c in result.columns:
                return c
        raise ValueError(f"no score column in {result.columns}")

    def search_with_snippets(
        self,
        library_id: str,
        query_text: str,
        k: int | None = None,
        metadata_filters: dict[str, Any] | None = None,
        snippet_window: int = 8,
        mode: str = "or",
    ) -> DataFrame:
        """Top-k search + highlight snippets: run the library's regular
        dispatch (any index path; filter-then-search applies), join the
        k hits back to their chunk text, and attach each hit's best
        ``snippet_window``-token window (most query-term hits, earliest
        on ties) with its 1-based start offset.  The snippet transform
        (`operators/presentation.py::best_snippet`, shared with the
        oracle-checked registry query) runs over the k-row result
        broadcast against the chunks table — bounded presentation work
        on top of the retrieval plan."""
        result = self.search(
            library_id,
            query_text=query_text,
            k=k,
            metadata_filters=metadata_filters,
            mode=mode,
        )
        score_col = self._score_column(result)
        texts = self.chunks(library_id).select("id", "text")
        hits = F.broadcast(result).join(texts, "id")
        return pres_mod.best_snippet(
            hits,
            bm25_mod.tokenize_query(query_text),
            snippet_window,
            id_col="id",
        ).orderBy(F.desc(score_col), "id")

    def search_collapsed(
        self,
        library_id: str,
        collapse_key: str,
        query_text: str | None = None,
        query_embedding: list[float] | None = None,
        k: int | None = None,
        per_key: int = 2,
        metadata_filters: dict[str, Any] | None = None,
        window_factor: int = 5,
        mode: str = "or",
    ) -> DataFrame:
        """Field-collapsed top-k (Elasticsearch `collapse`): retrieve a
        ``window_factor * k`` pool through the regular dispatch, tag each
        hit with its ``metadata[collapse_key]`` value, keep at most
        ``per_key`` hits per value, return the global top-k of the
        survivors.  Collapsing runs INSIDE the retrieval window
        (`operators/presentation.py::collapse_topk`, shared with the
        oracle-checked registry query), so a key with a million corpus
        hits still contributes only its share of the window — bounded
        presentation work.  Chunks without the key collapse together as
        the NULL group (the Elasticsearch missing-field behavior).
        Returns the search columns + (collapse_value, collapse_rank)."""
        k = self.config.clamp_k(k)
        pool_k = min(max(window_factor * k, k), self.config.max_k)
        pool = self.search(
            library_id,
            query_text=query_text,
            query_embedding=query_embedding,
            k=pool_k,
            metadata_filters=metadata_filters,
            mode=mode,
        )
        score_col = self._score_column(pool)
        keys = self.chunks(library_id).select(
            "id", F.col("metadata")[collapse_key].alias("collapse_value")
        )
        tagged = F.broadcast(pool).join(keys, "id")
        return pres_mod.collapse_topk(
            tagged,
            key_col="collapse_value",
            score_col=score_col,
            id_col="id",
            per_key=per_key,
            k=k,
        )

    def search_autocut(
        self,
        library_id: str,
        query_text: str | None = None,
        query_embedding: list[float] | None = None,
        k: int | None = None,
        metadata_filters: dict[str, Any] | None = None,
        mode: str = "or",
    ) -> DataFrame:
        """Dynamic-k search (Weaviate `autocut`): retrieve top-k through
        the regular dispatch, then cut the ranked list at the largest
        adjacent score gap (`operators/rerank.py::autocut`, shared with
        the oracle-checked registry query) — results after relevance
        falls off a cliff are dropped instead of padding to k.  O(k)
        coordinator work over the collected result.  Returns the search
        columns + autocut_rank; at most k rows, usually fewer."""
        result = self.search(
            library_id,
            query_text=query_text,
            query_embedding=query_embedding,
            k=k,
            metadata_filters=metadata_filters,
            mode=mode,
        )
        score_col = self._score_column(result)

        def _s(r):
            v = r[score_col]
            return float("-inf") if v is None else v

        rows = sorted(result.collect(), key=lambda r: (-_s(r), r["id"]))
        cut = rerank_mod.autocut([_s(r) for r in rows])
        kept = [
            {**r.asDict(), "autocut_rank": i + 1}
            for i, r in enumerate(rows[:cut])
        ]
        # fresh StructType — StructType.add MUTATES the receiver in
        # place, so result.schema.add(...) would plant a phantom
        # autocut_rank field on result's cached schema object (r6 ADVICE)
        out_schema = StructType(
            result.schema.fields + [StructField("autocut_rank", IntegerType())]
        )
        if not kept:
            return self.spark.createDataFrame([], out_schema)
        return self.spark.createDataFrame(kept, out_schema).orderBy(
            "autocut_rank"
        )

    def search_expanded(
        self,
        library_id: str,
        query_text: str,
        k: int | None = None,
        metadata_filters: dict[str, Any] | None = None,
        fb_k: int = 10,
        n_expansion_terms: int = 5,
        min_nqc: float | None = None,
    ) -> DataFrame:
        """RM3 pseudo-relevance feedback through the library's keyword
        index (requires index_type 'bm25' or 'hybrid'): pass 1 retrieves
        the BM25 top-``fb_k`` feedback docs (filter-then-search applies),
        expansion terms come from the FEEDBACK DOCS' POSTING ROWS
        (`operators/bm25.py::rm3_expansion` — feedback-bounded index
        reads, never a text re-tokenize), and pass 2 re-queries the
        postings with the weighted expansion terms
        (`operators/bm25.py::rm3_search`; the metadata filter restricts
        candidates in BOTH passes while df stays corpus-level).  The
        registry twin `rm3_expanded_search` oracle-checks the same
        pipeline against DuckDB on the documents corpus.  Returns
        (id, score), at most k rows.

        ``min_nqc`` enables SELECTIVE expansion (the query-drift guard
        of the selective-PRF literature: expansion helps queries whose
        first pass already looks coherent and hurts unstable ones):
        pass 1's NQC difficulty score (stddev of the top scores, top-1
        normalized, computed from the ALREADY-COLLECTED pass-1 rows at
        zero extra cost) gates pass 2 — below the threshold the plain
        pass-1 top-k returns unexpanded.  None (default) always
        expands.

        NQC normalization caveat (r7 ADVICE): this gate computes NQC
        over the ACTUAL hit list — ``len(scores) <= fb_k`` unrounded
        scores — while the registry twin `query_difficulty_nqc`
        divides by exactly 10 over ROUNDED top-10 scores (its oracle
        contract needs the fixed denominator).  The two agree whenever
        pass 1 returns >= fb_k=10 hits (rounding noise aside); for
        thinner result lists this definition uses the honest sample
        size, so a ``min_nqc`` threshold calibrated from the registry
        surface transfers only for queries with full top-10 lists —
        calibrate from this method's own scores for tail queries."""
        from vector_database_api_spark.operators.filters import (
            apply_metadata_filters,
        )

        meta = self._index_meta(library_id)
        if meta is None or meta[0] not in ("bm25", "hybrid"):
            raise ValueError(
                "search_expanded needs a built bm25 or hybrid index"
            )
        postings, doclens, n_docs, avgdl = self._read_text_index(meta[1])
        k = self.config.clamp_k(k)
        cand = None
        if metadata_filters:
            cand = apply_metadata_filters(
                self.chunks(library_id), metadata_filters
            ).select("id")
        terms = bm25_mod.tokenize_query(query_text)
        if min_nqc is not None:
            pass1 = bm25_mod.bm25_search(
                postings,
                doclens,
                n_docs,
                avgdl,
                terms,
                k=max(int(fb_k), int(k)),
                candidate_ids=cand,
            ).collect()
            scores = [r["score"] for r in pass1[: int(fb_k)]]
            nqc = 0.0
            if scores and scores[0] > 0.0:
                m = sum(scores) / len(scores)
                var = sum((s - m) * (s - m) for s in scores) / len(scores)
                nqc = var**0.5 / scores[0]
            if nqc < min_nqc:
                return self.spark.createDataFrame(
                    [(r["id"], r["score"]) for r in pass1[: int(k)]],
                    "id string, score double",
                )
            feedback = self.spark.createDataFrame(
                [(r["id"],) for r in pass1[: int(fb_k)]], "id string"
            )
        else:
            feedback = bm25_mod.bm25_search(
                postings,
                doclens,
                n_docs,
                avgdl,
                terms,
                k=fb_k,
                candidate_ids=cand,
            ).select("id")
        expansion = bm25_mod.rm3_expansion(
            postings, doclens, terms, feedback, n_terms=n_expansion_terms
        )
        return bm25_mod.rm3_search(
            postings,
            doclens,
            n_docs,
            avgdl,
            expansion,
            k=k,
            candidate_ids=cand,
        )

    def search_after(
        self,
        library_id: str,
        after_score: float,
        after_id: str,
        query_text: str | None = None,
        query_embedding: list[float] | None = None,
        k: int | None = None,
        metadata_filters: dict[str, Any] | None = None,
        similarity_threshold: float | None = None,
        mode: str = "or",
        ranking: str = "bm25",
    ) -> DataFrame:
        """Keyset-paginated search: the next k results STRICTLY after the
        cursor (after_score, after_id) — the exact score+id the previous
        page returned.  Page N costs the same scan/posting reads +
        top-k as page 1 (the cursor filter composes BEFORE the top-k),
        unlike OFFSET paging whose cost grows with page depth.
        Supported on the bm25 index path (cursor on the BM25 score) and
        the brute-force path (cursor on cosine similarity); the
        ANN-index paths intentionally do not paginate — their candidate
        sets are probe-bounded, so "page 2" would need a wider probe,
        not a cursor (raise rather than silently return wrong pages).
        The registry twin `bm25_keyword_page2` hash-proves keyset ==
        OFFSET paging against DuckDB.

        ``similarity_threshold`` follows the same F7 contract as
        ``search()`` — same default from config, same per-path score
        column — so page 2 can never return a row the page-1 contract
        filtered out (it didn't until r7: the r6 ADVICE inconsistency).

        ``mode`` (bm25 path): "or", "and", "maxscore" or "blockmax" — a
        conjunctive
        ranking paginates like any other (the cursor composes with the
        all-terms filter before the top-k), and MaxScore pagination is
        CURSOR-AWARE: theta derives from the cursored essential-term
        ranking (operators/bm25.py::bm25_maxscore_search(after=)), so
        pruning stays lossless per page (pinned page-for-page equal to
        mode="or" pagination in pytest)."""
        meta = self._index_meta(library_id)
        kind = meta[0] if meta is not None else None
        if mode not in ("or", "and", "maxscore", "blockmax"):
            raise ValueError(
                "mode must be 'or', 'and', 'maxscore' or 'blockmax', "
                f"got '{mode}'"
            )
        if mode != "or" and kind != "bm25":
            raise ValueError(
                f"mode='{mode}' needs a built bm25 index, not '{kind}'"
            )
        self._check_ranking(ranking, mode, kind)
        k = self.config.clamp_k(k)
        if similarity_threshold is None:
            similarity_threshold = self.config.similarity_threshold
        chunks = self.chunks(library_id)
        if kind == "bm25":
            if query_text is None:
                raise ValueError("a bm25 index searches by query_text")
            from vector_database_api_spark.operators.filters import (
                apply_metadata_filters,
            )

            postings, doclens, n_docs, avgdl = self._read_text_index(meta[1])
            cand = None
            if metadata_filters:
                cand = apply_metadata_filters(chunks, metadata_filters).select(
                    "id"
                )
            terms = bm25_mod.tokenize_query(query_text)
            if ranking == "ql":
                page = bm25_mod.ql_dirichlet_search(
                    postings, doclens, float(n_docs) * float(avgdl),
                    terms, k=k, candidate_ids=cand,
                    after=(after_score, after_id), operator=mode,
                )
                return self._apply_threshold(
                    page, similarity_threshold, score_col="score"
                )
            if mode in ("maxscore", "blockmax"):
                page = bm25_mod.bm25_maxscore_search(
                    postings,
                    doclens,
                    n_docs,
                    avgdl,
                    terms,
                    k=k,
                    candidate_ids=cand,
                    after=(after_score, after_id),
                    n_blocks=bm25_mod.BLOCKMAX_BLOCKS if mode == "blockmax" else None,
                )
            else:
                page = bm25_mod.bm25_search(
                    postings,
                    doclens,
                    n_docs,
                    avgdl,
                    terms,
                    k=k,
                    candidate_ids=cand,
                    after=(after_score, after_id),
                    operator=mode,
                )
            return self._apply_threshold(
                page, similarity_threshold, score_col="score"
            )
        if kind is None:
            if query_embedding is None:
                if query_text is None:
                    raise ValueError("query must have text or embedding")
                query_embedding = [
                    float(x)
                    for x in text_to_vector(
                        query_text, self.config.embedding_dim
                    )
                ]
            query = self.spark.createDataFrame(
                [(query_embedding,)], "query_embedding array<float>"
            )
            return self._apply_threshold(
                knn_brute_force(
                    chunks,
                    query,
                    k=k,
                    metadata_filters=metadata_filters,
                    after=(after_score, after_id),
                ),
                similarity_threshold,
            )
        raise ValueError(
            f"search_after supports bm25/brute-force paths, not '{kind}'"
        )

    MLT_N_TERMS = 3

    def suggest_terms(
        self, library_id: str, prefix: str, n: int = 5
    ) -> DataFrame:
        """Prefix autocomplete from the stored text index (bm25 or
        hybrid required): the ``n`` most-frequent index terms starting
        with ``prefix``, by (document frequency DESC, term ASC) —
        the suggest-as-you-type surface (registry twin
        `term_autocomplete` oracle-checks the same ranking).  Cost is a
        vocab-sized aggregate over the prefix-filtered postings — the
        predicate pushes to the parquet scan of the index, never
        touches chunk text.  Empty prefix is rejected (it would rank
        the whole vocabulary)."""
        if not prefix:
            raise ValueError("prefix must be non-empty")
        meta = self._index_meta(library_id)
        if meta is None or meta[0] not in ("bm25", "hybrid"):
            raise ValueError(
                "suggest_terms needs a bm25 or hybrid index, "
                f"not '{meta[0] if meta else None}'"
            )
        postings, _, _, _ = self._read_text_index(meta[1])
        return (
            postings.filter(F.col("term").startswith(prefix))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("df"))
            .orderBy(F.desc("df"), "term")
            .limit(int(n))
        )

    def find_similar(
        self,
        library_id: str,
        chunk_id: str,
        k: int | None = None,
        by: str = "vector",
    ) -> DataFrame:
        """Find-similar-by-id: the "more like this document" surface a
        store serves next to free-text search (Elasticsearch
        more_like_this with a doc reference; the reference engine only
        offers query-by-vector — this closes the by-id gap on both
        evidence types).  ``by="vector"`` ranks by cosine to the seed
        chunk's own embedding (no index needed — the brute-force scan,
        an ANN index slots in identically); ``by="text"`` is Lucene-style
        MLT from the stored text index: the seed's top tf*idf terms
        (len >= 3, df from the posting lists — a TERM-BOUNDED probe,
        never a corpus scan) feed the shared BM25 scorer (registry twin
        `more_like_this_topk` oracle-checks the same math).  The seed
        itself is excluded; a missing chunk raises KeyError (the
        reference's 404 analogue).  k+1 rows collect and the seed drops
        at the coordinator (bounded by max_k) — a filter above the
        sorted limit would not preserve ranking order."""
        if by not in ("vector", "text"):
            raise ValueError(f"by must be 'vector' or 'text', got '{by}'")
        k = self.config.clamp_k(k)
        chunks = self.chunks(library_id)
        seed = (
            chunks.filter(F.col("id") == chunk_id)
            .select("embedding")
            .first()
        )
        if seed is None:
            raise KeyError(
                f"chunk '{chunk_id}' not found in library '{library_id}'"
            )
        if by == "vector":
            qdf = self.spark.createDataFrame(
                [([float(x) for x in seed["embedding"]],)],
                "query_embedding array<float>",
            )
            rows = knn_brute_force(chunks, qdf, k=int(k) + 1).collect()
            keep = [r for r in rows if r["id"] != chunk_id][: int(k)]
            return self.spark.createDataFrame(
                [(r["id"], r["similarity"], r["distance"]) for r in keep],
                "id string, similarity double, distance double",
            )
        meta = self._index_meta(library_id)
        if meta is None or meta[0] not in ("bm25", "hybrid"):
            raise ValueError(
                "find_similar(by='text') needs a bm25 or hybrid index, "
                f"not '{meta[0] if meta else None}'"
            )
        postings, doclens, n_docs, avgdl = self._read_text_index(meta[1])
        seed_post = postings.filter(F.col("id") == chunk_id).filter(
            F.length("term") >= 3
        )
        dfs = (
            postings.join(
                F.broadcast(seed_post.select("term")), "term", "left_semi"
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("double").alias("df"))
        )
        idf = F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        terms = [
            r["term"]
            for r in seed_post.join(F.broadcast(dfs), "term")
            .select("term", (F.col("tf").cast("double") * idf).alias("wt"))
            .orderBy(F.desc("wt"), "term")
            .limit(self.MLT_N_TERMS)
            .collect()
        ]
        if not terms:
            return self.spark.createDataFrame([], "id string, score double")
        rows = bm25_mod.bm25_search(
            postings, doclens, n_docs, avgdl, terms, k=int(k) + 1
        ).collect()
        keep = [r for r in rows if r["id"] != chunk_id][: int(k)]
        return self.spark.createDataFrame(
            [(r["id"], r["score"]) for r in keep], "id string, score double"
        )
