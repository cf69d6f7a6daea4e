"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Fill these in as you implement operators from
SURVEY.md §2. Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: do not
call ``ray.init()`` / ``ray.shutdown()`` here, in the library code these
functions use, or inside the callables.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0.

    Synthesizes the Common-Crawl-style pages table (url, warc_ts, html,
    text, lang) deterministically from the sf0.001 documents table, runs the
    full near-dup detection + clustering pipeline, returns the label table.
    """
    import ray.data as rd

    from eridu_ray.config import PipelineConfig
    from eridu_ray.pipelines.dedup import run_dedup
    from eridu_ray.sources.synth import synthesize_corpus

    cfg = PipelineConfig(num_partitions=8)
    info = synthesize_corpus("/root/testdata/sf0.001", "/tmp/eridu_cache",
                             cfg)
    pages = rd.read_parquet(info["pages"])
    res = run_dedup(pages, cfg)
    return res.labels


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.

    Each callable takes ``sf_dir`` (e.g. "/root/testdata/sf0.01") and
    returns a Dataset / pandas DataFrame / pyarrow Table. Name every
    computed/aggregate column so names match ``oracle_sql``.
    """
    from eridu_ray.pipelines.relational import build_queries

    qs = dict(build_queries())
    qs["dedup_flagship"] = _q_dedup_flagship
    qs["dedup_incremental"] = _q_dedup_incremental

    # CSV source/sink round-trips (S3/S8/S9; oracle-paired — merged
    # into one tagged row r4 to free a slot for substring_cut)
    from eridu_ray.sources import csv_io

    qs["csv_io_roundtrip"] = csv_io.q_csv_io

    # flat-map augmentation family (M8/M9/M10; oracle-paired)
    from eridu_ray.stages import augment

    qs["ending_extract"] = augment.q_ending_extract
    qs["acronyms"] = augment.q_acronyms

    # temporal joins/windows over events (as-of join, interval join,
    # session + sliding windows; all oracle-paired — the two window ops
    # register through the tagged union row `event_windows` (r4: freed
    # one slot for `url_canon`); both stay individually oracle-gated in
    # tests/test_temporal.py)
    from eridu_ray.pipelines.temporal import TEMPORAL_MERGED, TEMPORAL_QUERIES

    qs.update({k: v for k, v in TEMPORAL_QUERIES.items()
               if k not in TEMPORAL_MERGED})

    # corpus text statistics (vocab/bigram top-k via partial combine,
    # broadcast-DF rarest term, RE2 redaction; all oracle-paired)
    from eridu_ray.pipelines.textstats import TEXTSTATS_QUERIES

    qs.update(TEXTSTATS_QUERIES)

    # training-example preparation (overlapping chunk explode +
    # concat-and-chunk sequence packing; both oracle-paired — slots
    # freed r4 by the semi_anti_join and quality_scores merges)
    from eridu_ray.pipelines.training import TRAINING_QUERIES

    qs.update(TRAINING_QUERIES)

    # T6: standalone corpus->embedding encoder stage (rows-only: stub
    # embedding values are engine-defined, not SQL-expressible)
    from eridu_ray.stages.scorer import encode_documents

    qs["doc_embeddings"] = encode_documents

    # text-dedup operator family over documents (rows-only check; brute
    # -force oracles live in tests/test_ops.py).  r4: the four variants
    # (minhash / simhash / ngram-jaccard / exact) merged into ONE tagged
    # union entry so all four paths execute inside a single driver row —
    # the 3 freed slots carry the oracle-paired curation family below
    from eridu_ray.pipelines import text_dedup as td

    qs["text_dedup_pairs"] = td.text_dedup_pairs

    # substring dedup: suffix-array-verified shared spans excised from
    # the non-canonical doc (Lee et al. 2022-style duplicate-span
    # removal; rows-only — planted-span golden tests in
    # tests/test_substring.py)
    from eridu_ray.pipelines.substring import q_substring_cut

    qs["substring_cut"] = q_substring_cut

    # LLM-corpus curation family (all oracle-paired): C4/Gopher-style
    # per-doc quality verdicts, CCNet-style boilerplate n-gram
    # detection, and per-source-pair n-gram overlap analysis
    from eridu_ray.pipelines.curation import CURATION_QUERIES

    qs.update(CURATION_QUERIES)

    # lexical retrieval: BM25 top-k (oracle-paired; the sparse baseline
    # beside the embedding ANN family — slot freed by the
    # quality_scores+doc_fingerprint -> doc_profile merge)
    from eridu_ray.pipelines.retrieval import RETRIEVAL_QUERIES

    qs.update(RETRIEVAL_QUERIES)

    # ANN over embeddings (rows-only; IVF recall gated in tests)
    def _ann_ivf(sf_dir: str):
        import ray.data as rd

        from eridu_ray.stages.ann import ivf_topk

        emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
        return ivf_topk(emb, [0, 1, 2, 3, 4], k=10).drop_columns(["sim"])

    qs["ann_ivf_topk"] = _ann_ivf

    # multimodal stages (rows-only). The r3 deterministic-fake decode
    # entry (mm.decode_images) is superseded in the driver registry by the
    # REAL BMP decode below — the fake path stays tested in tests/test_ops.
    from eridu_ray.stages import multimodal as mm

    # REAL decodes: pure-numpy BMP / PCM-WAV parsers over deterministic
    # synthesized payloads (rows-only; round-trip + golden-value tests in
    # tests/test_multimodal*.py).  All three multimodal stages run inside
    # ONE registry entry (r4: bmp/audio merged, then the frame-sample
    # explode folded in too, freeing a slot for the oracle-paired
    # semantic_dedup while keeping the registry at the driver's 50-query
    # window) — a union of the actor-pool stages projected to a common
    # (payload_id, kind, m1..m4) schema; m1..m4 are
    # width/height/channels/bytes for bmp,
    # sample_rate/channels/duration_ms/rms_micro for wav, and
    # frame_index/offset_ms/0/0 for the 1->N frame explode.
    def _mm_decode(sf_dir: str):
        import numpy as np
        import pyarrow as pa

        def proj(kind, cols):
            def f(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return pa.table({
                    "payload_id": b["payload_id"],
                    "kind": pa.array(
                        np.full(b.num_rows, kind, dtype=object),
                        pa.string()),
                    **{f"m{i + 1}": pc.cast(b[c], pa.int64())
                       for i, c in enumerate(cols)}})

            return f

        bmp = mm.decode_bmp_images(sf_dir).map_batches(
            proj("bmp", ["width", "height", "channels", "payload_bytes"]),
            batch_format="pyarrow")
        wav = mm.decode_audio(sf_dir).map_batches(
            proj("wav", ["sample_rate", "channels", "duration_ms",
                         "rms_micro"]),
            batch_format="pyarrow")

        def proj_frames(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "payload_id": b["payload_id"],
                "kind": pa.array(
                    np.full(b.num_rows, "frame", dtype=object),
                    pa.string()),
                "m1": pc.cast(b["frame_index"], pa.int64()),
                "m2": pc.cast(b["offset_ms"], pa.int64()),
                "m3": pa.array(np.zeros(b.num_rows, np.int64)),
                "m4": pa.array(np.zeros(b.num_rows, np.int64))})

        frames = mm.sample_frames(sf_dir).map_batches(
            proj_frames, batch_format="pyarrow")
        return bmp.union(wav).union(frames)

    qs["multimodal_decode"] = _mm_decode

    # benchmark decontamination (exact 128-bit + word-5-gram overlap vs
    # a broadcast benchmark set; oracle-paired)
    from eridu_ray.pipelines.decontaminate import q_decontaminate

    qs["decontaminate"] = q_decontaminate

    # entity-aware split over flagship components (D7/M16; rows-only —
    # leakage invariant asserted in tests/test_evaluate.py)
    def _component_split(sf_dir: str):
        from eridu_ray.stages.evaluate import component_split

        return component_split(_q_dedup_flagship(sf_dir))

    qs["component_split"] = _component_split

    # conformance-checks corpus (F4; sf-independent, rows-only)
    def _checks(sf_dir: str):
        from eridu_ray.pipelines.checks import evaluate_checks

        return evaluate_checks()

    qs["checks_conformance"] = _checks
    return qs


def _q_dedup_flagship(sf_dir: str) -> Any:
    """Full near-dup pipeline labels over pages synthesized from sf_dir
    (rows-only check: MinHash/LSH/CC is not SQL-expressible; correctness
    is asserted against shared-kernel ground truth in tests/)."""
    import ray.data as rd

    from eridu_ray.config import PipelineConfig
    from eridu_ray.pipelines.dedup import run_dedup
    from eridu_ray.sources.synth import synthesize_corpus

    cfg = PipelineConfig(num_partitions=8)
    info = synthesize_corpus(sf_dir, "/tmp/eridu_cache", cfg)
    return run_dedup(rd.read_parquet(info["pages"]), cfg).labels


def _q_dedup_incremental(sf_dir: str) -> Any:
    """Incremental dedup (pipelines/incremental.py): the synthesized
    corpus is split in half by url hash, the first half deduped from
    scratch and its explode state + exact-group index persisted, the
    second folded in via the default state path (v3 key-pruned state
    reads + v4 stateful exact groups, new-rows-only shuffles); returns
    the combined labels (rows-only check — byte-equality with the full
    rerun across v1/v2/v3/v4 is gated in tests/test_incremental.py)."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from eridu_ray.config import PipelineConfig
    from eridu_ray.kernels.hashing import hash_strings_u64
    from eridu_ray.pipelines.dedup import run_dedup
    from eridu_ray.pipelines.incremental import (build_incremental_state,
                                                 run_dedup_incremental)
    from eridu_ray.sources.synth import synthesize_corpus

    cfg = PipelineConfig(num_partitions=8)
    info = synthesize_corpus(sf_dir, "/tmp/eridu_cache", cfg)
    pages = pq.read_table(info["pages"])
    mask = (hash_strings_u64(pages["url"].to_pylist(), seed=7)
            % np.uint64(2)).astype(bool)
    prior = run_dedup(rd.from_arrow(pages.filter(pa.array(~mask))), cfg)
    state_dir = tempfile.mkdtemp(prefix="eridu_inc_state_")
    try:
        state = build_incremental_state(prior, cfg, state_dir)
        labels = run_dedup_incremental(
            rd.from_arrow(pages.filter(pa.array(mask))), prior, cfg,
            state_dir=state).labels.materialize()
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
    return labels


def oracle_sql() -> dict[str, str]:
    """For each key in ``queries()``, equivalent ANSI SQL runnable by
    DuckDB on the same parquet tables (pre-registered views: region
    nation customer supplier part orders lineitem events documents
    embeddings). Omit for non-SQL-expressible ops → driver records a
    weaker rows-only check.
    """
    from eridu_ray.pipelines.curation import ORACLE_SQL as CUR_SQL
    from eridu_ray.pipelines.decontaminate import DECONTAMINATE_SQL
    from eridu_ray.pipelines.relational import ORACLE_SQL
    from eridu_ray.pipelines.temporal import TEMPORAL_MERGED
    from eridu_ray.pipelines.temporal import ORACLE_SQL as _TEMP_ALL

    TEMP_SQL = {k: v for k, v in _TEMP_ALL.items()
                if k not in TEMPORAL_MERGED}
    from eridu_ray.pipelines.retrieval import ORACLE_SQL as RETR_SQL
    from eridu_ray.pipelines.textstats import ORACLE_SQL as TEXT_SQL
    from eridu_ray.pipelines.training import ORACLE_SQL as TRAIN_SQL
    from eridu_ray.sources.csv_io import ORACLE_SQL as CSV_SQL
    from eridu_ray.stages.augment import ORACLE_SQL as AUG_SQL

    merged = {**ORACLE_SQL, **TEMP_SQL, **TEXT_SQL, **TRAIN_SQL, **CSV_SQL,
              **AUG_SQL, **CUR_SQL, **RETR_SQL,
              "decontaminate": DECONTAMINATE_SQL}
    # restrict to registered queries: the merged-row parents
    # (quality_scores, doc_fingerprint, url_canon, redact_numbers) keep
    # their SQL importable for the in-repo per-parent gates, but the
    # driver contract pairs oracle keys 1:1 with queries()
    reg = set(queries())
    return {k: v for k, v in merged.items() if k in reg}
