"""Document-table pipelines: text analysis, dedup, similarity, flagship.

Each function takes ``sf_dir`` and returns a Dataset; names match the
oracle SQL in ``__ray_entry__`` where one exists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from docling_graph_ray.stages import text_analysis as ta
from docling_graph_ray.stages.dedup import (
    embedding_near_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_dedup,
    simhash_dedup,
)
from docling_graph_ray.stages.similarity import brute_force_topk, lsh_bucket_topk


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _embs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=columns)


# ---------------------------------------------------------------------------
# text analysis (oracle-checkable)


def doc_token_counts(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.token_count_batch, batch_format="pyarrow"
    )


def doc_quality(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.quality_batch, batch_format="pyarrow"
    )


def doc_exact_dedup(sf_dir: str):
    """Exact-text dedup summary: keeper id + copy count per distinct text
    (hash-partition + per-group aggregate; text itself never shuffles —
    only its 64-bit hash)."""
    from docling_graph_ray.stages.dedup import add_text_hash

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_text_hash("text"), batch_format="pyarrow"
    )

    def summarize(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "keeper_id": pa.array([pc.min(group.column("doc_id")).as_py()], pa.int64()),
                "n_copies": pa.array([group.num_rows], pa.int64()),
            }
        )

    return ds.groupby("text_hash").map_groups(summarize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# text analysis (rows-only)


def doc_langid(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.langid_batch, batch_format="pyarrow"
    )


def doc_fingerprints(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.fingerprint_batch, batch_format="pyarrow"
    )


def doc_bpe_tokens(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.bpe_token_count_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# near-dup dedup family (rows-only; semantics tested in unit tests)


def doc_minhash_dedup(sf_dir: str):
    return minhash_lsh_dedup(_docs(sf_dir, ["doc_id", "text"]))


def doc_simhash_dedup(sf_dir: str):
    return simhash_dedup(_docs(sf_dir, ["doc_id", "text"]))


def doc_ngram_jaccard_dedup(sf_dir: str):
    return ngram_jaccard_dedup(_docs(sf_dir, ["doc_id", "text"]))


def emb_near_dedup(sf_dir: str):
    return embedding_near_dedup(
        _embs(sf_dir, ["vec_id", "embedding"]), dim=64, cosine_threshold=0.98
    )


# ---------------------------------------------------------------------------
# similarity search


def _query_matrix(sf_dir: str, n: int = 4) -> tuple[np.ndarray, list[int]]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = pc.sort_indices(t.column("vec_id"))[:n]
    tt = t.take(idx)
    return (
        np.array(tt.column("embedding").to_pylist(), dtype=np.float64),
        tt.column("vec_id").to_pylist(),
    )


def emb_topk(sf_dir: str, k: int = 10):
    q, qids = _query_matrix(sf_dir)
    return brute_force_topk(
        _embs(sf_dir, ["vec_id", "embedding"]), q, k=k, query_ids=qids,
        dtype=np.float64,  # oracle-matched precision (DuckDB DOUBLE[] cosine)
    )


def emb_lsh_topk(sf_dir: str, k: int = 10):
    q, qids = _query_matrix(sf_dir)
    return lsh_bucket_topk(
        _embs(sf_dir, ["vec_id", "embedding"]), q, k=k, query_ids=qids
    )


# ---------------------------------------------------------------------------
# flagship pages pipeline (synthetic pages scaled by sf_dir)

_SF_ROWS = {"sf0.001": 300, "sf0.01": 1500, "sf0.1": 6000}


def pages_flagship(sf_dir: str):
    """Flagship extraction on the deterministic synthetic pages table;
    row count keyed to the sf tier.  Returns deduped extracted rows
    (url, text_sha256, parse stats) — no raw text, stable for hashing."""
    from docling_graph_ray.fixtures.pages import pages_dataset
    from docling_graph_ray.pipelines.extract import (
        dedup_extracted,
        extract_pages_dataset,
    )

    tier = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    n = _SF_ROWS.get(tier, 300)
    ded = dedup_extracted(
        extract_pages_dataset(pages_dataset(n, profile="t1"), num_partitions=16)
    )
    return ded.map_batches(
        lambda t: t.select(
            ["url", "text_sha256", "n_blocks_kept", "n_blocks_dropped", "parse_status"]
        ),
        batch_format="pyarrow",
    )


def media_pipeline(sf_dir: str):
    """Multimodal plumbing: synthetic media table → actor-pool features."""
    from docling_graph_ray.stages.multimodal import make_media_table, media_features

    tbl = make_media_table(64)
    ds = ray.data.from_arrow(tbl)
    feats = media_features(ds, concurrency=(1, 2), batch_size=8)
    return feats.map_batches(
        lambda t: pa.table(
            {
                "media_id": t.column("media_id"),
                "media_type": pc.struct_field(t.column("meta"), "media_type"),
                "feat_norm": pa.array(
                    [round(float(np.linalg.norm(v)), 4) for v in t.column("feature").to_pylist()],
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
