"""Engine defaults mirroring the reference configuration.

Reference: ``/root/reference/app/config.py`` — LSH ``num_tables=8`` /
``hash_length=12`` (config.py:29-30), IVF ``nlist=100`` / ``nprobe=5``
(config.py:31-32), ``default_k=5`` / ``max_k=100`` (config.py:35-36,62-68),
embedding dim 1024 (config.py:20).  Our test fixtures use 64-d embeddings
(driver ``embeddings`` table), so the dim is a parameter, not a constant.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    # LSH (sign random projection — cosine family)
    lsh_num_tables: int = 8
    lsh_hash_length: int = 12
    # IVF (inverted file over k-means)
    ivf_nlist: int = 100
    ivf_nprobe: int = 5
    ivf_kmeans_max_iter: int = 10
    # PQ (engine extension, operators/pq.py; m=16 on 64-d => dsub=4,
    # 16 B/vector — the measured recall/compression middle ground, PLANS.md)
    pq_m: int = 16
    pq_k: int = 16
    # search
    default_k: int = 5
    max_k: int = 100
    # F7: the reference declares similarity_threshold=0.0 but never applies
    # it (app/config.py:37 — dead config).  None preserves that observable
    # behavior (no filtering; negative-cosine matches are returned, as the
    # reference does); set a float to enable filter(similarity >= t).
    similarity_threshold: float | None = None
    # embeddings
    embedding_dim: int = 64
    # determinism (the reference is unseeded — indexes.py:70,240; we fix seeds)
    seed: int = 42

    def clamp_k(self, k: int | None) -> int:
        """k<=0 or None -> default; k>max -> max (reference config.py:62-68)."""
        if k is None or k <= 0:
            return self.default_k
        return min(k, self.max_k)


DEFAULT_CONFIG = EngineConfig()

# LSH serving-quality profiles (measured in tools/ann_quality.py; table in
# PLANS.md).  The reference's L=8/k=12 hyperparameters give recall@10 ~0.14
# on the 64-d driver embeddings — hash_length tuned for the actual dim
# (shorter hashes => wider buckets => more candidates) lifts recall to
# ~0.48 at a still-pruned candidate pool.  Selectable per index build via
# ``VectorEngine.index_library(..., lsh_profile=...)``; the chosen profile
# is persisted with the index so search always hashes with the same
# geometry.
LSH_PROFILES: dict[str, dict[str, int]] = {
    "reference": {"num_tables": 8, "hash_length": 12},
    "tuned": {"num_tables": 8, "hash_length": 6},
}

# IVF serving-quality profiles (measured in tools/ann_quality.py; recall
# grid in PLANS.md).  'reference' mirrors the reference's nlist=100 /
# nprobe=5 (config.py:31-32) — on the 64-d driver embeddings that is a
# degenerate layout (nlist near the corpus size at small SF).  'trained-p4'
# is the MEASURED RECOMMENDED serving layout: seeded-KMeans k=20 centroids
# with 4 probes — recall@2 0.59 on the ann_quality grid vs 0.47 for the
# frozen-centroid p=4 twin and 0.25 at p=1, at 4/20 of the probe cost of a
# full scan.  Selectable per index build via
# ``VectorEngine.index_library(..., ivf_profile=...)``; the chosen geometry
# is persisted with the index so search probes with the same layout.
# ``None`` keeps the engine-config values (reference parity default).
IVF_PROFILES: dict[str, dict[str, int]] = {
    "reference": {"nlist": 100, "nprobe": 5},
    "trained-p4": {"nlist": 20, "nprobe": 4},
}
