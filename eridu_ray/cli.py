"""Command-line surface for the eridu_ray engine.

Mirrors the reference's click CLI shape (eridu/cli/main.py:82-660:
``download`` / ``etl report`` / ``compare`` / ``evaluate test`` /
``evaluate checks`` command groups, ordered help) re-expressed over the
Ray-Data pipelines in this repo.  The sandbox has no network, so the
reference's ``download`` becomes ``ingest`` (local gz-CSV -> Parquet,
same conversion step as eridu/cli/main.py:134-147) and model-bearing
commands fall back to the deterministic hashed encoder when
sentence-transformers is absent.

The CLI owns its Ray session (the library never calls ray.init):
each command initializes a local session lazily and shuts it down on
exit so consecutive invocations start clean.
"""

from __future__ import annotations

import json
import os
import sys
from collections import OrderedDict

import click


class _RaySession:
    """Lazy local Ray session: inits only if none exists, and shuts down
    only a session it created (an in-process caller — e.g. the test
    suite's session fixture — keeps its own session)."""

    def __init__(self, num_cpus: int | None = None):
        import ray

        self._ray = ray
        self._owned = not ray.is_initialized()
        if self._owned:
            # honor RAY_ADDRESS so `ray job submit` drivers join the
            # submitting cluster instead of forking a local one; absent
            # (or preset "local", as in tests) this is a local session
            address = os.environ.get("RAY_ADDRESS", "local")
            kwargs = {"address": address, "ignore_reinit_error": True}
            if address == "local":
                # cluster-only kwargs are invalid when joining an
                # existing cluster
                kwargs["include_dashboard"] = False
                if num_cpus:
                    kwargs["num_cpus"] = num_cpus
            ray.init(**kwargs)

    def shutdown(self) -> None:
        if self._owned:
            self._ray.shutdown()


def _ray_session(num_cpus: int | None = None) -> _RaySession:
    return _RaySession(num_cpus)


class OrderedGroup(click.Group):
    """Click group that lists commands in registration order
    (reference: eridu/cli/main.py:70-79)."""

    def __init__(self, name=None, commands=None, **attrs):
        super().__init__(name, commands, **attrs)
        self.commands = OrderedDict(self.commands)

    def list_commands(self, ctx):
        return list(self.commands)


@click.group(cls=OrderedGroup, context_settings={"show_default": True})
def cli() -> None:
    """eridu_ray: Ray-Data-native web-scale dedup + entity-pair engine."""


# --------------------------------------------------------------------------
# ingest (reference `download`'s local conversion step)
# --------------------------------------------------------------------------
@cli.command(context_settings={"show_default": True})
@click.option("--csv-path", required=True,
              help="Path to a gzipped CSV file to ingest")
@click.option("--output-dir", default="./data",
              help="Directory to write the Parquet conversion into")
@click.option("--num-cpus", default=0, type=int,
              help="Ray CPUs (0 = Ray default)")
def ingest(csv_path: str, output_dir: str, num_cpus: int) -> None:
    """Convert a gzipped CSV into Parquet (distributed read -> write)."""
    ray = _ray_session(num_cpus or None)
    try:
        from eridu_ray.sources.csv_io import gzip_csv_to_parquet

        os.makedirs(output_dir, exist_ok=True)
        out = gzip_csv_to_parquet(csv_path, output_dir)
        click.echo(f"wrote {out}")
        click.echo("to generate a report on this data, run:")
        click.echo(f"  python -m eridu_ray report --parquet-path {out}")
    finally:
        ray.shutdown()


# --------------------------------------------------------------------------
# report (reference `etl report`: eridu/etl/report.py:145)
# --------------------------------------------------------------------------
@cli.command(context_settings={"show_default": True})
@click.option("--parquet-path", required=True,
              help="Parquet file/dir to report on")
@click.option("--top-k", default=10, type=int,
              help="Rows per value-count listing")
@click.option("--num-cpus", default=0, type=int)
def report(parquet_path: str, top_k: int, num_cpus: int) -> None:
    """Summary report: row count, schema, null counts, top value counts
    per low-cardinality column (reference report.py's count/groupby set)."""
    ray = _ray_session(num_cpus or None)
    try:
        import pyarrow as pa
        import ray.data as rd

        ds = rd.read_parquet(parquet_path)
        schema = ds.schema()
        n = ds.count()
        click.echo(f"rows: {n}")
        click.echo("schema:")
        for name, typ in zip(schema.names, schema.types):
            click.echo(f"  {name}: {typ}")
        # nulls + value counts for string/int columns, all as Dataset aggs
        for name, typ in zip(schema.names, schema.types):
            if not (pa.types.is_string(typ) or pa.types.is_integer(typ)):
                continue
            vc = (ds.select_columns([name]).groupby(name).count()
                  .sort("count()", descending=True).limit(top_k).take_all())
            click.echo(f"top values of {name}:")
            for r in vc:
                click.echo(f"  {r[name]!r}: {r['count()']}")
    finally:
        ray.shutdown()


# --------------------------------------------------------------------------
# synth (fixture generation; engine-specific)
# --------------------------------------------------------------------------
@cli.command(context_settings={"show_default": True})
@click.option("--sf-dir", default="/root/testdata/sf0.001",
              help="Driver testdata dir holding documents.parquet")
@click.option("--out-dir", default="/tmp/eridu_ray_corpus",
              help="Directory to materialize the synthetic corpus under")
@click.option("--repeat", default=1, type=int,
              help="Corpus replication factor (disjoint doc_id ranges)")
@click.option("--fatten", default=0, type=int,
              help="Filler multiple per doc (payload bytes, no new pairs)")
@click.option("--num-cpus", default=0, type=int)
def synth(sf_dir: str, out_dir: str, repeat: int, fatten: int,
          num_cpus: int) -> None:
    """Materialize the deterministic synthetic web-pages corpus."""
    ray = _ray_session(num_cpus or None)
    try:
        from eridu_ray.config import PipelineConfig
        from eridu_ray.sources.synth import (synthesize_corpus,
                                             synthesize_pages_ray)

        cfg = PipelineConfig()
        if repeat > 1 or fatten > 0:
            info = synthesize_pages_ray(sf_dir, out_dir, cfg,
                                        repeat=repeat, fatten=fatten)
        else:
            info = synthesize_corpus(sf_dir, out_dir, cfg)
        click.echo(json.dumps(info, indent=2))
    finally:
        ray.shutdown()


# --------------------------------------------------------------------------
# dedup (the flagship; reference's core clustering workflow Clusters.md)
# --------------------------------------------------------------------------
@cli.command(context_settings={"show_default": True})
@click.option("--input", "input_path", required=True,
              help="Pages Parquet (url/warc_ts/html/text/lang columns)")
@click.option("--output", "output_dir", required=True,
              help="Directory for the component-labels Parquet")
@click.option("--checkpoint-dir", default=None,
              help="Stage-checkpoint dir (resume on rerun)")
@click.option("--scorer/--no-scorer", default=True,
              help="Borderline scorer edges in the flagship edge set")
@click.option("--dup-jaccard", default=0.80, type=float,
              help="Exact-Jaccard duplicate threshold")
@click.option("--save-state", default=None,
              help="Also persist a fold state (signatures + labels + "
                   "explode tables) for later `fold` increments")
@click.option("--num-cpus", default=0, type=int)
def dedup(input_path: str, output_dir: str, checkpoint_dir: str | None,
          scorer: bool, dup_jaccard: float, save_state: str | None,
          num_cpus: int) -> None:
    """Run the near-duplicate detection + clustering pipeline and write
    (url, component, component_size) labels as partitioned Parquet."""
    ray = _ray_session(num_cpus or None)
    try:
        import ray.data as rd

        from eridu_ray.config import PipelineConfig
        from eridu_ray.pipelines.dedup import run_dedup

        cfg = PipelineConfig(dup_jaccard=dup_jaccard,
                             use_scorer_edges=scorer,
                             checkpoint_dir=checkpoint_dir)
        pages = rd.read_parquet(input_path)
        res = run_dedup(pages, cfg)
        os.makedirs(output_dir, exist_ok=True)
        res.labels.write_parquet(output_dir)
        n = res.labels.count()
        if save_state:
            from eridu_ray.pipelines.incremental import save_fold_state

            save_fold_state(res, cfg, save_state)
        click.echo(json.dumps({"labels_rows": n,
                               "counters": res.counters,
                               "output": output_dir,
                               "state": save_state}))
    finally:
        ray.shutdown()


# --------------------------------------------------------------------------
# fold — daily-increment dedup (beyond-reference; pipelines/incremental.py)
# --------------------------------------------------------------------------
@cli.command(context_settings={"show_default": True})
@click.option("--state", "state_dir", required=True,
              help="Fold state written by `dedup --save-state` (or a "
                   "previous `fold --update-state`)")
@click.option("--input", "input_path", required=True,
              help="NEW pages Parquet to fold into the prior corpus "
                   "(urls must be disjoint from it)")
@click.option("--output", "output_dir", required=True,
              help="Directory for the combined component-labels Parquet")
@click.option("--update-state/--no-update-state", default=False,
              help="Roll the state forward to the combined corpus so "
                   "the next increment folds against it")
@click.option("--state-update-mode",
              type=click.Choice(["append", "append-compact", "rebuild"]),
              default="append",
              help="append: O(increment) roll-forward (explode deltas + "
                   "signature append + label swap); append-compact: "
                   "append, then merge each partition's accumulated "
                   "delta files into one sorted file — O(state) I/O, no "
                   "signature recompute (run periodically so v3's "
                   "per-file key scans stop growing with fold count); "
                   "rebuild: O(corpus) full state rebuild")
@click.option("--scorer/--no-scorer", default=True)
@click.option("--dup-jaccard", default=0.80, type=float)
@click.option("--checkpoint-dir", default=None,
              help="Fold stage-checkpoint dir: a killed fold rerun "
                   "with the same state/input/config resumes from its "
                   "last committed stage (byte-identical labels); a "
                   "changed increment or appended state invalidates "
                   "the checkpoints automatically")
@click.option("--num-cpus", default=0, type=int)
def fold(state_dir: str, input_path: str, output_dir: str,
         update_state: bool, state_update_mode: str, scorer: bool,
         dup_jaccard: float, checkpoint_dir: str | None,
         num_cpus: int) -> None:
    """Fold a batch of NEW pages into a prior dedup state without
    re-verifying the prior corpus against itself; labels over the
    combined corpus are byte-identical to a from-scratch rerun
    (pipelines/incremental.py, gated in tests/test_incremental.py).
    The config flags must match the state's manifest or the fold is
    refused."""
    ray = _ray_session(num_cpus or None)
    try:
        import ray.data as rd

        from eridu_ray.config import PipelineConfig
        from eridu_ray.pipelines.incremental import (load_fold_state,
                                                     run_dedup_incremental,
                                                     save_fold_state)

        cfg = PipelineConfig(dup_jaccard=dup_jaccard,
                             use_scorer_edges=scorer,
                             checkpoint_dir=checkpoint_dir)
        prior = load_fold_state(state_dir, cfg)
        res = run_dedup_incremental(rd.read_parquet(input_path), prior,
                                    cfg, state_dir=state_dir)
        os.makedirs(output_dir, exist_ok=True)
        res.labels.write_parquet(output_dir)
        n = res.labels.count()
        if update_state and state_update_mode in ("append",
                                                  "append-compact"):
            from eridu_ray.pipelines.incremental import (
                append_fold_state, compact_fold_state)

            append_fold_state(res, cfg, state_dir)
            if state_update_mode == "append-compact":
                compact_fold_state(cfg, state_dir)
        elif update_state:
            import shutil
            import tempfile

            # write-new-then-swap: a failed rewrite must not destroy
            # the only copy of the prior state
            tmp = tempfile.mkdtemp(
                prefix=".state_next_",
                dir=os.path.dirname(os.path.abspath(state_dir)) or ".")
            save_fold_state(res, cfg, tmp)
            old = state_dir.rstrip("/") + ".prev"
            shutil.rmtree(old, ignore_errors=True)
            os.rename(state_dir, old)
            os.rename(tmp, state_dir)
            shutil.rmtree(old, ignore_errors=True)
        click.echo(json.dumps({"labels_rows": n,
                               "counters": res.counters,
                               "output": output_dir,
                               "state_updated": update_state,
                               "state_update_mode": (state_update_mode
                                                     if update_state
                                                     else None)}))
    finally:
        ray.shutdown()


# --------------------------------------------------------------------------
# compact — out-of-band fold-state maintenance (pipelines/incremental.py)
# --------------------------------------------------------------------------
@cli.command(context_settings={"show_default": True})
@click.option("--state", "state_dir", required=True,
              help="Fold state rolled forward by `fold --update-state`")
@click.option("--scorer/--no-scorer", default=True,
              help="Must match the state's manifest (as for fold)")
@click.option("--dup-jaccard", default=0.80, type=float,
              help="Must match the state's manifest (as for fold)")
@click.option("--num-cpus", default=0, type=int)
def compact(state_dir: str, scorer: bool, dup_jaccard: float,
            num_cpus: int) -> None:
    """Merge each state partition's accumulated append-delta files into
    one key-sorted file — O(state) I/O, NO signature recompute
    (incremental.compact_fold_state).  Run between daily
    `fold --update-state` runs (e.g. weekly) so the per-file key scans
    of pruned state reads stop growing with fold count; the exact index
    also sheds superseded rep rows.  Fold labels are unaffected."""
    ray = _ray_session(num_cpus or None)
    try:
        from eridu_ray.config import PipelineConfig
        from eridu_ray.pipelines.incremental import compact_fold_state

        cfg = PipelineConfig(dup_jaccard=dup_jaccard,
                             use_scorer_edges=scorer)
        stats = compact_fold_state(cfg, state_dir)
        click.echo(json.dumps({"state": state_dir, "families": stats}))
    finally:
        ray.shutdown()


# --------------------------------------------------------------------------
# compare (reference `compare`: eridu/cli/main.py:514-561)
# --------------------------------------------------------------------------
@cli.command(context_settings={"show_default": True})
@click.argument("text1", type=str)
@click.argument("text2", type=str)
@click.option("--model-path", default=None,
              help="SentenceTransformer dir (falls back to hashed stub)")
@click.option("--threshold", default=0.90, type=float,
              help="Similarity >= threshold => match")
def compare(text1: str, text2: str, model_path: str | None,
            threshold: float) -> None:
    """Score two texts with the pair scorer; prints the similarity
    (reference prints cosine-derived score to 3 decimals, main.py:552-560).

    Driver-side (no Ray session needed for one pair)."""
    import numpy as np
    import pyarrow as pa

    from eridu_ray.config import PipelineConfig
    from eridu_ray.kernels.shingle import shingle_set32
    from eridu_ray.kernels.text import normalize_text
    from eridu_ray.stages.scorer import PairScorer

    cfg = PipelineConfig()
    scorer = PairScorer(cfg, use_sbert=model_path is not None,
                        model_path=model_path)
    sh = [shingle_set32(normalize_text(t), cfg.shingle_k, cfg.seed)
          .astype("<u4").tobytes() for t in (text1, text2)]
    batch = pa.table({
        "text_a": [text1], "text_b": [text2],
        "sh_a": pa.array([sh[0]], pa.binary()),
        "sh_b": pa.array([sh[1]], pa.binary()),
    })
    sim = float(scorer(batch)["similarity"][0].as_py())
    click.echo(f"{sim:.3f}")
    click.echo(f"match: {sim >= threshold}")


# --------------------------------------------------------------------------
# evaluate group (reference `evaluate test` / `evaluate checks`)
# --------------------------------------------------------------------------
@cli.group(cls=OrderedGroup, context_settings={"show_default": True})
def evaluate() -> None:
    """Evaluate scored pairs or the checks conformance corpus."""


@evaluate.command(name="test", context_settings={"show_default": True})
@click.option("--scored-path", required=True,
              help="Parquet of scored pairs (similarity + label columns)")
@click.option("--threshold", default=None, type=float,
              help="Classification threshold (default: F1-optimal sweep)")
@click.option("--score-col", default="similarity")
@click.option("--label-col", default="label")
@click.option("--num-cpus", default=0, type=int)
def evaluate_test(scored_path: str, threshold: float | None,
                  score_col: str, label_col: str, num_cpus: int) -> None:
    """Accuracy/P/R/F1 report over a scored-pairs Parquet
    (reference: eridu/cli/main.py:568-608)."""
    ray = _ray_session(num_cpus or None)
    try:
        import ray.data as rd

        from eridu_ray.stages.evaluate import (best_threshold,
                                               classification_metrics,
                                               confusion_counts)

        ds = rd.read_parquet(scored_path)
        if threshold is None:
            best = best_threshold(ds, score_col=score_col,
                                  label_col=label_col)
            threshold = best["threshold"]
            click.echo(f"optimal threshold: {threshold:.4f} "
                       f"(f1={best['f1']:.4f})")
        counts = confusion_counts(ds, threshold, score_col=score_col,
                                  label_col=label_col)
        click.echo(json.dumps(classification_metrics(counts)))
    finally:
        ray.shutdown()


@evaluate.command(name="checks", context_settings={"show_default": True})
@click.option("--schema", "schemas", multiple=True,
              help="Schema filter (repeatable); default: all schemas")
@click.option("--per-schema/--no-per-schema", default=True,
              help="Break metrics out per schema category")
def evaluate_checks_cmd(schemas: tuple, per_schema: bool) -> None:
    """Checks-corpus conformance report (reference `evaluate checks`,
    eridu/etl/checks_evaluation.py).  Driver-side — the corpus is small."""
    from eridu_ray.pipelines.checks import (checks_metrics,
                                            checks_metrics_by_schema,
                                            evaluate_checks)

    results = evaluate_checks(schemas=set(schemas) or None)
    out = {"overall": checks_metrics(results)}
    if per_schema:
        out["per_schema"] = checks_metrics_by_schema(results)
    click.echo(json.dumps(out, indent=2))


# --------------------------------------------------------------------------
# encode (T6 corpus embedding stage as a batch job)
# --------------------------------------------------------------------------
@cli.command(context_settings={"show_default": True})
@click.option("--sf-dir", default="/root/testdata/sf0.001",
              help="Testdata dir holding documents.parquet")
@click.option("--out-dir", required=True,
              help="Directory for the embeddings Parquet")
@click.option("--dim", default=256, type=int)
@click.option("--num-cpus", default=0, type=int)
def encode(sf_dir: str, out_dir: str, dim: int, num_cpus: int) -> None:
    """Encode the documents table into unit-norm embeddings
    (actor-pool DocEncoder; ANN-compatible layout)."""
    ray = _ray_session(num_cpus or None)
    try:
        from eridu_ray.stages.scorer import encode_documents

        ds = encode_documents(sf_dir, dim=dim)
        os.makedirs(out_dir, exist_ok=True)
        ds.write_parquet(out_dir)
        click.echo(json.dumps({"rows": ds.count(), "dim": dim,
                               "output": out_dir}))
    finally:
        ray.shutdown()


@cli.command(context_settings={"show_default": True})
@click.option("--sf-dir", default="/root/testdata/sf0.001",
              help="Testdata dir holding documents.parquet")
@click.option("--out-dir", required=True,
              help="Directory for the cut-documents Parquet")
@click.option("--min-span", default=100, type=int,
              help="Minimum shared-span length (chars) to excise")
@click.option("--spans-only", is_flag=True, default=False,
              help="Write the verified (doc_id_a, doc_id_b, span_len, "
                   "pos_a, pos_b) table instead of cutting")
@click.option("--num-cpus", default=0, type=int)
def substring(sf_dir: str, out_dir: str, min_span: int,
              spans_only: bool, num_cpus: int) -> None:
    """Suffix-array substring dedup: find long shared spans between
    documents (winnow candidates -> generalized-SA verify with offsets)
    and excise them from the higher-doc_id copy (Lee et al. 2022-style
    duplicate-span removal; pipelines/substring.py)."""
    ray = _ray_session(num_cpus or None)
    try:
        from eridu_ray.pipelines.substring import (substring_cut,
                                                   substring_spans)

        if spans_only:
            ds = substring_spans(sf_dir, min_span=min_span)
        else:
            ds = substring_cut(sf_dir, min_span=min_span)
        os.makedirs(out_dir, exist_ok=True)
        ds.write_parquet(out_dir)
        click.echo(json.dumps({"rows": ds.count(), "min_span": min_span,
                               "mode": "spans" if spans_only else "cut",
                               "output": out_dir}))
    finally:
        ray.shutdown()


@cli.command(context_settings={"show_default": True})
@click.option("--sf-dir", default="/root/testdata/sf0.001",
              help="Testdata dir holding documents.parquet")
@click.option("--terms", default="dup,vector,merge",
              help="Comma-separated query terms")
@click.option("--top-k", default=20, type=int)
@click.option("--num-cpus", default=0, type=int)
def search(sf_dir: str, terms: str, top_k: int, num_cpus: int) -> None:
    """BM25 lexical retrieval over the documents table: top-k doc_ids
    by Okapi BM25 score of the query terms (pipelines/retrieval.py)."""
    ray = _ray_session(num_cpus or None)
    try:
        from eridu_ray.pipelines.retrieval import q_bm25_topk

        qterms = tuple(t for t in terms.split(",") if t)
        rows = q_bm25_topk(sf_dir, k=top_k, terms=qterms).take_all()
        click.echo(json.dumps({"terms": list(qterms), "k": top_k,
                               "hits": rows}))
    finally:
        ray.shutdown()


def main() -> None:
    cli(prog_name="eridu_ray")


if __name__ == "__main__":
    sys.exit(main())
