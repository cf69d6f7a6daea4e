"""Deterministic Common-Crawl-style page corpus with known dup structure.

Role model: the reference's synthetic-pair generator, which mutates company
names into labeled match/non-match pairs with a score prior
(eridu/etl/disco.py:54-184).  Here the same idea is applied to documents:
each base row of ``/root/testdata/sf*/documents.parquet`` deterministically
spawns exact duplicates (same text, different url + boilerplate), near
duplicates (few-token edits), and long-shared-span ("substring") pages.
Ground truth (truth_pairs / truth_labels per FIXTURES.md F2/F3) is derived
with the same shared kernels the pipeline uses, so dup-pair recall is
measured at *identical* shingle/signature config (BASELINE.md).

Everything is a pure function of (seed, doc_id) — no global RNG — so the
expansion can run as a distributed ``map_batches`` over the documents table
and still produce byte-identical corpora at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from eridu_ray.config import PipelineConfig
from eridu_ray.kernels.shingle import (jaccard32, longest_common_substring_len,
                                       shingle_set32)
from eridu_ray.kernels.text import normalize_text, render_html
from eridu_ray.kernels.unionfind import connected_components

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_EPOCH_US = 1735689600_000_000  # 2025-01-01T00:00:00Z in microseconds

# extra filler vocabulary for token substitutions (deterministic)
_SUBS = [f"zrep{i}" for i in range(64)]

GENERATOR_VERSION = 5  # v4: borderline variants adjudicated by the stub
                       # scorer + per-doc cipher isolation (no salt tokens)
                       # v5: fatten filler namespace widened to a 32-bit
                       # per-doc shift (filler content changed -> bench
                       # fixture caches must regenerate)

_CIPHER_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"


def _salt_text(text: str, doc_id: int) -> str:
    """Per-doc substitution cipher: distinct base docs can never be
    accidental near-duplicates of each other.

    The driver's documents table contains repeated/near-identical texts
    across doc_ids (verified: pairs up to Jaccard 1.0), while ground
    truth assumes per-doc independence.  Instead of interleaving salt
    tokens (which inflated text ~1.7x and still leaked shared shingles
    through the salts' common scaffolding — identical texts sat at
    J≈0.75, inside the borderline window → false cross-doc merges), the
    whole text goes through a seeded per-doc character permutation over
    [a-z0-9]: identical base texts land at J≈0 across docs, zero length
    overhead, and all within-doc variant similarity (derived from the
    ciphered text) is preserved exactly.
    """
    rng = np.random.default_rng([doc_id, 0xC1F4])
    perm = rng.permutation(len(_CIPHER_ALPHABET))
    table = str.maketrans(
        _CIPHER_ALPHABET, "".join(_CIPHER_ALPHABET[p] for p in perm))
    return text.translate(table)


def _page_url(source: str, lang: str, doc_id: int, variant: str) -> str:
    return f"https://{source}.example.com/{lang}/doc-{doc_id:08d}/{variant}"


def _mutate_tokens(tokens: list[str], rng: np.random.Generator,
                   lo: float = 0.01, hi: float = 0.03) -> list[str]:
    """Substitute ~lo..hi of tokens (>=1) — a 'near' duplicate edit."""
    toks = list(tokens)
    n_edit = max(1, int(len(toks) * rng.uniform(lo, hi)))
    idx = rng.choice(len(toks), size=min(n_edit, len(toks)), replace=False)
    for i in idx:
        toks[i] = _SUBS[int(rng.integers(0, len(_SUBS)))]
    return toks


def expand_documents_batch(batch: pa.Table, seed: int = 31337) -> pa.Table:
    """documents rows -> webpages rows (1 base + 0..3 variant pages each).

    Pure per-row function of (seed, doc_id): usable directly in
    ``map_batches(batch_format="pyarrow")`` at any parallelism.
    """
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()

    urls, tss, htmls, out_texts, out_langs = [], [], [], [], []

    def emit(url: str, ts_us: int, text: str, lang: str, boiler: str,
             title: str) -> None:
        urls.append(url)
        tss.append(ts_us)
        htmls.append(render_html(text, title=title, boiler=boiler))
        out_texts.append(text)
        out_langs.append(lang)

    for doc_id, text, lang, source in zip(doc_ids, texts, langs, sources):
        rng = np.random.default_rng([seed, int(doc_id)])
        text = _salt_text(text, int(doc_id))
        ts0 = _EPOCH_US + int(doc_id) * 60_000_000
        emit(_page_url(source, lang, doc_id, "base"), ts0, text, lang,
             boiler=f"chrome-{source}", title=f"doc {doc_id}")
        r = rng.random()
        if r < 0.10:  # exact duplicates: same text, new url + boilerplate
            for v in range(1 + int(rng.integers(0, 2))):
                emit(_page_url(source, lang, doc_id, f"exact{v}"),
                     ts0 + 1_000_000 * (v + 1), text, lang,
                     boiler=f"mirror-{v}", title=f"copy {doc_id}")
        elif r < 0.40:  # near duplicates: few-token edits
            tokens = text.split(" ")
            for v in range(1 + int(rng.integers(0, 3))):
                mtext = " ".join(_mutate_tokens(tokens, rng))
                emit(_page_url(source, lang, doc_id, f"near{v}"),
                     ts0 + 2_000_000 * (v + 1), mtext, lang,
                     boiler=f"chrome-{source}", title=f"doc {doc_id} v{v}")
        elif r < 0.52:  # borderline near-dups: heavier edits land exact
            # Jaccard in/around [borderline, dup) so the TRUTH of the pair
            # depends on the stub scorer's verdict (F6) — the fixture that
            # keeps the flagship's scorer stage honest
            tokens = text.split(" ")
            for v in range(1 + int(rng.integers(0, 2))):
                mtext = " ".join(_mutate_tokens(tokens, rng,
                                                lo=0.03, hi=0.12))
                emit(_page_url(source, lang, doc_id, f"bord{v}"),
                     ts0 + 4_000_000 * (v + 1), mtext, lang,
                     boiler=f"chrome-{source}", title=f"doc {doc_id} b{v}")
        elif r < 0.57:  # long-shared-span page: low jaccard, big substring
            junk = " ".join(
                f"pad{int(x)}" for x in rng.integers(0, 9999, len(text) // 6))
            mtext = junk + " " + text + " " + junk
            emit(_page_url(source, lang, doc_id, "span0"),
                 ts0 + 3_000_000, mtext, lang,
                 boiler="aggregator", title=f"quoting doc {doc_id}")
        # else: singleton
    return pa.Table.from_arrays(
        [pa.array(urls, pa.string()),
         pa.array(tss, pa.timestamp("us")),
         pa.array(htmls, pa.binary()),
         pa.array(out_texts, pa.string()),
         pa.array(out_langs, pa.string())],
        schema=PAGES_SCHEMA)


def truth_for_batch(batch: pa.Table, cfg: PipelineConfig,
                    seed: int = 31337) -> tuple[pa.Table, pa.Table]:
    """(truth_pairs, truth_labels) for the pages spawned by these documents.

    match=true iff exact char-k-gram Jaccard of normalized texts >=
    cfg.dup_jaccard (the reference-config ground truth); substring pages get
    kind='substring' rows regardless so the span stage has its own oracle.
    Labels are connected components of the match=true graph, canonical id =
    min url (order-independent; SURVEY.md §7.3).
    """
    from eridu_ray.stages.scorer import HashedEncoder

    enc = HashedEncoder(cfg)

    def stub_sim(sa: np.ndarray, sb: np.ndarray) -> float:
        values = np.concatenate([sa, sb])
        offsets = np.array([0, sa.size, sa.size + sb.size], dtype=np.int64)
        m = enc.embed_shingle_sets(values, offsets)
        return (float(m[0] @ m[1]) + 1.0) / 2.0

    pages = expand_documents_batch(batch, seed=seed)
    doc_of: dict[str, int] = {}
    for url in pages["url"].to_pylist():
        doc_of[url] = int(url.rsplit("/doc-", 1)[1].split("/")[0])
    by_doc: dict[int, list[int]] = {}
    for i, url in enumerate(pages["url"].to_pylist()):
        by_doc.setdefault(doc_of[url], []).append(i)

    urls = pages["url"].to_pylist()
    texts = pages["text"].to_pylist()

    pa_a, pa_b, pa_match, pa_j, pa_kind, pa_group, pa_span = \
        [], [], [], [], [], [], []
    edges = []
    for doc_id, idxs in by_doc.items():
        if len(idxs) < 2:
            continue
        sets = {i: shingle_set32(normalize_text(texts[i]), k=cfg.shingle_k,
                                 seed=cfg.seed) for i in idxs}
        for ai in range(len(idxs)):
            for bi in range(ai + 1, len(idxs)):
                i, j = idxs[ai], idxs[bi]
                iu, ju = ((i, j) if urls[i] <= urls[j] else (j, i))
                ua, ub = urls[iu], urls[ju]
                jac = jaccard32(sets[i], sets[j])
                is_span = "span" in ua or "span" in ub
                in_border = (cfg.borderline_jaccard <= jac
                             < cfg.dup_jaccard)
                # same rule the pipeline applies: hard dup above the
                # Jaccard cut; borderline pairs match iff the (shared,
                # deterministic) scorer agrees — reference semantics of
                # model-refined matching (eridu/train/utils.py:153-235)
                if jac >= cfg.dup_jaccard:
                    match = True
                elif in_border and cfg.use_scorer_edges:
                    match = stub_sim(sets[i], sets[j]) >= \
                        cfg.scorer_threshold
                else:
                    match = False
                kind = ("exact" if jac == 1.0 else
                        "substring" if is_span else
                        "borderline" if in_border else "near")
                span_true = (longest_common_substring_len(texts[iu],
                                                          texts[ju])
                             if is_span and not match else 0)
                pa_a.append(ua)
                pa_b.append(ub)
                pa_match.append(match)
                pa_j.append(jac)
                pa_kind.append(kind)
                pa_group.append(f"doc-{doc_id}")
                pa_span.append(span_true)
                if match:
                    edges.append((ua, ub))
    comp = connected_components(edges, nodes=urls)
    sizes: dict[str, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    truth_pairs = pa.table({
        "url_a": pa.array(pa_a, pa.string()),
        "url_b": pa.array(pa_b, pa.string()),
        "match": pa.array(pa_match, pa.bool_()),
        "jaccard_true": pa.array(pa_j, pa.float64()),
        "kind": pa.array(pa_kind, pa.string()),
        "group": pa.array(pa_group, pa.string()),
        "span_true": pa.array(pa_span, pa.int64()),
    })
    truth_labels = pa.table({
        "url": pa.array(urls, pa.string()),
        "component": pa.array([comp[u] for u in urls], pa.string()),
        "component_size": pa.array([sizes[comp[u]] for u in urls],
                                   pa.int64()),
    })
    return truth_pairs, truth_labels


def synthesize_pages_ray(sf_dir: str, out_dir: str, cfg: PipelineConfig,
                         seed: int = 31337, repeat: int = 1,
                         fatten: int = 0) -> dict:
    """Distributed (Ray) page generation with optional replication.

    ``repeat`` replicates the documents table with disjoint doc_id ranges
    (each replica re-ciphered per its new doc_id -> independent corpus
    mass) so benchmarks can scale input volume deterministically.
    ``fatten`` appends ``fatten * len(doc)`` deterministic filler tokens
    (unique-per-doc splitmix64 hex tokens — negligible cross-doc
    shingle overlap, ~n²/2⁴⁰ collision odds, so padding adds payload
    bytes without materially adding candidate pairs) BEFORE variant
    expansion: the driver testdata
    documents average ~0.7 KB while real Common-Crawl extracted text runs
    1-3 KB, and benchmark scaling behavior depends on per-doc payload.
    No ground truth is computed — use :func:`synthesize_corpus` for
    truth-bearing fixtures.  Cached+manifested like synthesize_corpus.
    """
    import json
    import os

    import ray.data as rd

    tag = (f"{os.path.basename(os.path.normpath(sf_dir))}"
           f"-g{GENERATOR_VERSION}-{seed}-r{repeat}-f{fatten}u-pages")
    root = os.path.join(out_dir, tag)
    manifest = os.path.join(root, "_manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            return json.load(f)

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))

    def replicate(batch: pa.Table) -> pa.Table:
        parts = []
        for r in range(repeat):
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            t = batch.set_column(
                batch.column_names.index("doc_id"), "doc_id",
                pa.array(ids + r * 10_000_000, pa.int64()))
            if fatten:
                from eridu_ray.kernels.hashing import splitmix64

                texts = t["text"].to_pylist()
                new_ids = t["doc_id"].to_numpy(zero_copy_only=False)
                fat = []
                for did, txt in zip(new_ids, texts):
                    ntok = txt.count(" ") + 1
                    # per-doc filler tokens with negligible cross-doc
                    # shingle overlap (40-bit splitmix64 truncations —
                    # collisions are ~n²/2⁴⁰-improbable, not impossible),
                    # so padding adds payload without materially adding
                    # candidate pairs.  The 32-bit per-doc namespace
                    # shift keeps the filler index out of the doc-id
                    # bits for any ntok*fatten < 2³² (doc ids stay
                    # < 2³², so the shifted key fits uint64).
                    hs = splitmix64((np.uint64(did) << np.uint64(32))
                                    | np.arange(ntok * fatten,
                                                dtype=np.uint64))
                    fat.append(txt + " " + " ".join(
                        f"{int(x) & 0xFFFFFFFFFF:010x}" for x in hs))
                t = t.set_column(t.column_names.index("text"), "text",
                                 pa.array(fat, pa.string()))
            parts.append(t)
        return pa.concat_tables(parts)

    pages = (docs.map_batches(replicate, batch_format="pyarrow")
             .map_batches(lambda b: expand_documents_batch(b, seed=seed),
                          batch_format="pyarrow", batch_size=512))
    tmp = root + ".tmp"
    import shutil

    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    pages.write_parquet(tmp)
    if os.path.exists(root):
        shutil.rmtree(root)
    os.replace(tmp, root)
    info = {"root": root, "pages": root, "repeat": repeat}
    with open(manifest + ".tmp", "w") as f:
        json.dump(info, f)
    os.replace(manifest + ".tmp", manifest)
    return info


def synthesize_corpus(sf_dir: str, out_dir: str, cfg: PipelineConfig,
                      seed: int = 31337) -> dict:
    """Materialize pages + ground truth parquet under ``out_dir`` (cached).

    Driver-side pyarrow path (generation is a fixture step, not the
    benchmarked pipeline); idempotent per (sf_dir, seed, cfg hash).
    """
    import json
    import os

    import pyarrow.parquet as pq

    tag = (f"{os.path.basename(os.path.normpath(sf_dir))}-g{GENERATOR_VERSION}"
           f"-{seed}-{cfg.config_hash()}")
    root = os.path.join(out_dir, tag)
    manifest = os.path.join(root, "_manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            return json.load(f)
    os.makedirs(root, exist_ok=True)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    pages = expand_documents_batch(docs, seed=seed)
    pairs, labels = truth_for_batch(docs, cfg, seed=seed)
    pq.write_table(pages, os.path.join(root, "webpages.parquet"))
    pq.write_table(pairs, os.path.join(root, "truth_pairs.parquet"))
    pq.write_table(labels, os.path.join(root, "truth_labels.parquet"))
    info = {
        "root": root,
        "pages": os.path.join(root, "webpages.parquet"),
        "truth_pairs": os.path.join(root, "truth_pairs.parquet"),
        "truth_labels": os.path.join(root, "truth_labels.parquet"),
        "n_pages": pages.num_rows,
        "n_truth_pairs": pairs.num_rows,
    }
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump(info, f)
    os.replace(tmp, manifest)
    return info
