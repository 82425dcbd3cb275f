"""ANN recall gates: the registry queries assert recall in-plan
(recall_ok column); here we check the flags are actually TRUE at
sf0.001 so a tuning regression fails with a readable message instead
of an oracle hash diff, and that LSH multiprobe radius is monotone
(probing more buckets never loses candidates).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from soccer_data_pipeline_spark.plans import QUERIES
from soccer_data_pipeline_spark.sources.parquet_source import load_table

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


def test_lsh_macro_recall_gate(spark):
    row = QUERIES["similarity_ann_recall"].fn(spark, SF_DIR).collect()[0]
    assert row.n_queries == 10
    assert row.n_exact == 50
    assert row.recall_ok, "LSH macro recall fell below 0.75 — retune n_planes/multiprobe"


def test_ivf_per_query_recall_gate(spark):
    rows = QUERIES["similarity_ivf_recall"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    bad = [r.query_id for r in rows if not r.recall_ok]
    assert not bad, f"IVF per-query recall < 0.8 for queries {bad} — retune n_probe"


def test_multiprobe_radius_monotone(spark):
    from soccer_data_pipeline_spark.operators.similarity import ann_lsh_cosine

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    c = emb.where(F.col("vec_id") >= 10)
    ids = {}
    for radius in (0, 1, 2):
        df = ann_lsh_cosine(q, c, k=1000, n_planes=6, dim=64, multiprobe=radius)
        ids[radius] = {(r.query_id, r.candidate_id) for r in df.collect()}
    assert ids[0] <= ids[1] <= ids[2]


def test_ivf_quantizer_persist_reload(spark, tmp_path):
    """The quantizer survives a session restart: saved in Spark ML
    writer format, reloaded, and the probe results are identical to
    the in-memory model's (same centers -> same cells -> same top-k)."""
    from soccer_data_pipeline_spark.operators.similarity import (
        ivf_topk,
        load_ivf_quantizer,
        save_ivf_quantizer,
    )
    from soccer_data_pipeline_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    q = emb.where("vec_id < 5")
    c = emb.where("vec_id >= 5")
    out1, model = ivf_topk(q, c, k=3, n_centroids=4, n_probe=2)
    r1 = {(r.query_id, r.rn): r.candidate_id for r in out1.collect()}

    path = str(tmp_path / "ivf_quantizer")
    save_ivf_quantizer(model, path)
    loaded = load_ivf_quantizer(path)
    assert [list(x) for x in loaded.clusterCenters()] == [
        list(x) for x in model.clusterCenters()
    ]
    out2, _ = ivf_topk(q, c, k=3, n_centroids=4, n_probe=2, model=loaded)
    assert {(r.query_id, r.rn): r.candidate_id for r in out2.collect()} == r1


def test_ivf_incremental_equals_full(spark):
    """Equality-vs-full property (the dedup tier's incremental
    discipline applied to ANN): with the SAME quantizer, searching an
    index built incrementally (base built first, a new batch assigned
    via ivf_index and unioned on) returns EXACTLY the results of a
    full one-shot build — assignment is per-row given the centers, so
    incremental maintenance must cost nothing in result terms."""
    from soccer_data_pipeline_spark.operators.kmeans import fit_deterministic_kmeans
    from soccer_data_pipeline_spark.operators.similarity import (
        ivf_index,
        ivf_search,
        ivf_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    c = emb.where(F.col("vec_id") >= 10)
    base = c.where(F.col("vec_id") % 10 != 7)
    new = c.where(F.col("vec_id") % 10 == 7)
    model = fit_deterministic_kmeans(base, k=8, n_iters=2, sample_rows=2048)

    full, _ = ivf_topk(q, c, k=5, n_centroids=8, n_probe=4, model=model)
    incr = ivf_search(
        q,
        ivf_index(base, model).unionByName(ivf_index(new, model)),
        model,
        k=5,
        n_probe=4,
    )
    key = lambda rows: {(r.query_id, r.rn): r.candidate_id for r in rows}  # noqa: E731
    assert key(incr.collect()) == key(full.collect())


def test_ivf_incremental_store_roundtrip(spark, tmp_path):
    """Persisted-index round trip: quantizer JSON + index parquet
    saved, reloaded, a new batch incrementally assigned against the
    LOADED artifacts, and search over (loaded index) union (new
    assignments) equals the in-memory path — the across-app-restart
    maintenance story (no refit, no base rescan)."""
    from soccer_data_pipeline_spark.operators.similarity import (
        ivf_index,
        ivf_search,
        load_ivf_quantizer,
        save_ivf_quantizer,
    )
    from soccer_data_pipeline_spark.operators.kmeans import fit_deterministic_kmeans

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    c = emb.where(F.col("vec_id") >= 10)
    base = c.where(F.col("vec_id") % 10 != 7)
    new = c.where(F.col("vec_id") % 10 == 7)
    model = fit_deterministic_kmeans(base, k=8, n_iters=2, sample_rows=2048)

    qpath = str(tmp_path / "quantizer.json")
    ipath = str(tmp_path / "index.parquet")
    save_ivf_quantizer(model, qpath)
    ivf_index(base, model).write.parquet(ipath)

    loaded_model = load_ivf_quantizer(qpath)
    assert loaded_model.centers_q == model.centers_q
    loaded_index = spark.read.parquet(ipath)
    incr = ivf_search(
        q,
        loaded_index.unionByName(ivf_index(new, loaded_model)),
        loaded_model,
        k=5,
        n_probe=4,
    )
    mem = ivf_search(
        q,
        ivf_index(base, model).unionByName(ivf_index(new, model)),
        model,
        k=5,
        n_probe=4,
    )
    key = lambda rows: {(r.query_id, r.rn): r.candidate_id for r in rows}  # noqa: E731
    assert key(incr.collect()) == key(mem.collect())


def test_ivf_incremental_gates(spark):
    rows = QUERIES["similarity_ivf_incremental"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    bad = [r.query_id for r in rows if not (r.recall_ok and r.new_recall_ok)]
    assert not bad, f"incremental IVF gate false for queries {bad}"


def test_ivfpq_gates_and_incremental_index(spark):
    """Composed IVF×PQ: the registered gate is TRUE at sf0.001, and
    ivfpq_index extends incrementally — index(base) ∪ index(new) with
    the same quantizers searches identically to a one-shot build
    (cells and codes are per-row functions of persisted constants)."""
    from soccer_data_pipeline_spark.operators.kmeans import fit_deterministic_kmeans
    from soccer_data_pipeline_spark.operators.similarity import (
        ivfpq_index,
        ivfpq_search,
        ivfpq_topk,
    )

    rows = QUERIES["similarity_ivfpq_recall"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    bad = [r.query_id for r in rows if not r.recall_ok]
    assert not bad, f"IVFPQ per-query recall < 0.8 for queries {bad}"

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    c = emb.where(F.col("vec_id") >= 10)
    full, coarse, models = ivfpq_topk(
        q, c, k=5, shortlist=50, n_centroids=8, n_probe=4, m=16, n_codes=8
    )
    base = c.where(F.col("vec_id") % 10 != 7)
    new = c.where(F.col("vec_id") % 10 == 7)
    incr = ivfpq_search(
        q,
        ivfpq_index(base, coarse, models).unionByName(
            ivfpq_index(new, coarse, models)
        ),
        c,
        coarse,
        models,
        k=5,
        shortlist=50,
        n_probe=4,
    )
    key = lambda rs: {(r.query_id, r.rn): r.candidate_id for r in rs}  # noqa: E731
    assert key(incr.collect()) == key(full.collect())


def test_ivfpq_residual_roundtrip_and_gates(spark):
    """Residual-encoded IVF×PQ (the true FAISS IndexIVFPQ):

    - the registered gate is TRUE at sf0.001;
    - the index's stored ``chat_norm`` equals an independent Python
      reconstruction ‖centroid[cell] + codebook_s[code_s]‖ from the
      persisted constants (proves the encode path quantizes the
      RESIDUAL and the norm describes centroid + decoded residual,
      not the residual alone);
    - residual codes differ from raw-encoding codes on the same
      corpus/quantizers (proves the flag switches the encoding);
    - incremental extend: index(base) ∪ index(new) searches
      identically to the one-shot build (the FAISS `add` contract
      survives the residual form).
    """
    import math

    from soccer_data_pipeline_spark.operators.similarity import (
        ivfpq_index,
        ivfpq_search,
        ivfpq_topk,
    )

    rows = QUERIES["similarity_ivfpq_residual"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    bad = [r.query_id for r in rows if not r.recall_ok]
    assert not bad, f"residual IVFPQ per-query recall < 0.8 for queries {bad}"

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    c = emb.where(F.col("vec_id") >= 10)
    full, coarse, models = ivfpq_topk(
        q, c, k=5, shortlist=50, n_centroids=8, n_probe=4, m=16, n_codes=8,
        residual=True,
    )
    idx = ivfpq_index(c, coarse, models, residual=True)
    m = len(models)
    sub = len(models[0].clusterCenters()[0])
    centers = coarse.clusterCenters()
    books = [mod.clusterCenters() for mod in models]
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in c.select("vec_id", "embedding").collect()
    }
    for r in idx.limit(20).collect():
        chat = list(centers[r.cell])
        for s in range(m):
            cw = books[s][r[f"code{s}"]]
            for i in range(sub):
                chat[s * sub + i] += cw[i]
        expect = math.sqrt(sum(x * x for x in chat))
        assert abs(expect - r.chat_norm) < 1e-9, (r.candidate_id, expect, r.chat_norm)
        # and the decoded residual tracks the actual residual better
        # than decoding the raw vector would: sanity that codes were
        # fit/assigned in residual space — the nearest-codeword rule
        # applied to (vec - centroid)
        v = vecs[r.candidate_id]
        for s in range(m):
            res_s = [
                v[s * sub + i] - centers[r.cell][s * sub + i] for i in range(sub)
            ]
            d_chosen = sum(
                (res_s[i] - books[s][r[f"code{s}"]][i]) ** 2 for i in range(sub)
            )
            d_best = min(
                sum((res_s[i] - cw[i]) ** 2 for i in range(sub))
                for cw in books[s]
            )
            assert d_chosen <= d_best + 1e-9, (r.candidate_id, s)

    raw_idx = ivfpq_index(c, coarse, models, residual=False)
    code_cols = [f"code{s}" for s in range(m)]
    raw = {r.candidate_id: tuple(r[cc] for cc in code_cols) for r in raw_idx.collect()}
    res = {r.candidate_id: tuple(r[cc] for cc in code_cols) for r in idx.collect()}
    assert any(raw[i] != res[i] for i in raw), "residual flag changed nothing"

    base = c.where(F.col("vec_id") % 10 != 7)
    new = c.where(F.col("vec_id") % 10 == 7)
    incr = ivfpq_search(
        q,
        ivfpq_index(base, coarse, models, residual=True).unionByName(
            ivfpq_index(new, coarse, models, residual=True)
        ),
        c,
        coarse,
        models,
        k=5,
        shortlist=50,
        n_probe=4,
        residual=True,
    )
    key = lambda rs: {(r.query_id, r.rn): r.candidate_id for r in rs}  # noqa: E731
    assert key(incr.collect()) == key(full.collect())
