"""Text augmentation family: corporate endings + acronym generation
(SURVEY.md §2 M8/M9/M10).

Reimplements the reference's acronym augmentation semantics —
corporate-ending extraction (eridu/etl/acronyms.py:16-32), the 1→N
abbreviation generator with a multilingual stop-word filter
(eridu/etl/acronyms.py:35-73, stop words :6-13), and the vectorized UDF
wrapper returning ``array<struct<original, abbreviated>>``
(eridu/etl/augment.py:10-31) — as pure functions plus two Ray Data
stages: ``add_abbreviations`` appends the nested
``list<struct<original, abbreviated>>`` column (M10) and
``explode_abbreviations`` flat-maps it into one row per variant (M9).
The reference leans on the external ``disco``/``stop_words`` libraries;
here the legal-ending list and stop-word set are explicit so the exact
outputs are unit-testable (tests mirror
/root/reference/tests/etl/test_acronyms.py:33-80).
"""

from __future__ import annotations

import pyarrow as pa

# legal-form endings recognized by the basename stripper (lowercased,
# dot-insensitive) — the explicit stand-in for disco.basename
CORPORATE_ENDINGS = {
    "inc", "incorporated", "llc", "ltd", "limited", "corp", "corporation",
    "co", "company", "gmbh", "ag", "sa", "srl", "plc", "bv", "oy", "ab",
    "as", "nv", "kk", "pty", "llp", "lp", "sarl", "spa",
}

# multilingual stop words (en/de/es/fr subset — the reference unions
# every language of the stop_words package; the test-relevant members
# "the"/"and"/"of"/"es" are all present)
STOP_WORDS = {
    # en
    "the", "and", "of", "for", "in", "on", "a", "an", "to", "at", "by",
    # de
    "und", "der", "die", "das", "von", "für", "mit", "im", "ein",
    # es
    "es", "el", "la", "los", "las", "de", "del", "y", "en", "un", "una",
    # fr
    "le", "les", "et", "du", "des", "au", "aux", "une", "pour",
}


def basename(name: str) -> str:
    """Strip trailing legal-form tokens (disco.basename stand-in)."""
    if not name:
        return ""
    words = name.split()
    while words and words[-1].rstrip(".").lower() in CORPORATE_ENDINGS:
        words = words[:-1]
    return " ".join(words)


def get_corporate_ending(name: str | None) -> str:
    """M8: the suffix that basename stripping removed
    (eridu/etl/acronyms.py:16-32 semantics incl. empty/None)."""
    if not name:
        return ""
    cleaned = basename(name)
    if cleaned == name:
        return ""
    return name[len(cleaned):].strip()


def abbreviation_pairs(name: str | None) -> list[dict[str, str]]:
    """M9: 1→N abbreviation variants of a company-style name.

    Mirrors eridu/etl/acronyms.py:35-73: strip the legal ending, keep
    words that are neither stop words nor single letters, and — when at
    least two meaningful words remain — emit the plain acronym, the
    acronym + ending, the dotted acronym, and the dotted + ending.
    """
    if name is None or name == "":
        return []
    cleaned = basename(name)
    ending = get_corporate_ending(name)
    pairs: list[dict[str, str]] = []
    if cleaned and cleaned != name:
        meaningful = [w for w in cleaned.split()
                      if w.lower() not in STOP_WORDS and len(w) > 1]
        if len(meaningful) > 1:
            abbrev = "".join(w[0].upper() for w in meaningful)
            if len(abbrev) > 1:
                pairs.append({"original": name, "abbreviated": abbrev})
                if ending:
                    pairs.append({"original": name,
                                  "abbreviated": f"{abbrev} {ending}"})
                dotted = ".".join(w[0].upper() for w in meaningful) + "."
                pairs.append({"original": name, "abbreviated": dotted})
                if ending:
                    pairs.append({"original": name,
                                  "abbreviated": f"{dotted} {ending}"})
    return pairs


VARIANT_TYPE = pa.list_(pa.struct([("original", pa.string()),
                                   ("abbreviated", pa.string())]))


def add_abbreviations(ds, name_col: str = "name"):
    """M10: append ``variants: list<struct<original, abbreviated>>``.

    The Spark pandas_udf with an array<struct> return type
    (eridu/etl/augment.py:20-31) becomes a vectorized Arrow batch
    transform producing the same nested type.
    """
    def f(batch: pa.Table) -> pa.Table:
        variants = [abbreviation_pairs(n)
                    for n in batch[name_col].to_pylist()]
        return batch.append_column(
            "variants", pa.array(variants, VARIANT_TYPE))

    return ds.map_batches(f, batch_format="pyarrow")


def explode_abbreviations(ds, key_cols: tuple = ("doc_id",)):
    """M9 explode: one output row per (key, original, abbreviated).

    Rows with empty variant lists vanish (flat_map semantics).
    """
    def f(batch: pa.Table) -> pa.Table:
        import numpy as np

        col = batch["variants"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        flat = arr.flatten()  # struct array
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offsets)
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), counts)
        cols = {k: batch[k].take(pa.array(idx)) for k in key_cols}
        cols["original"] = flat.field("original")
        cols["abbreviated"] = flat.field("abbreviated")
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


# --- queries() entries ----------------------------------------------------

def q_ending_extract(sf_dir: str):
    """M8 gate: derive a company-style name per doc (first two text
    tokens + a deterministic legal ending) and extract basename/ending.
    SQL-parity: the name construction and stripping are expressible in
    DuckDB string functions."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    endings = ["Inc.", "LLC", "Corporation", "GmbH"]

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        names, bases, ends = [], [], []
        for did, t in zip(ids, batch["text"].to_pylist()):
            toks = t.split(" ")[:2]
            name = " ".join(toks) + " " + endings[did % 4]
            names.append(name)
            bases.append(basename(name))
            ends.append(get_corporate_ending(name))
        return pa.table({"doc_id": batch["doc_id"],
                         "name": pa.array(names, pa.string()),
                         "base_name": pa.array(bases, pa.string()),
                         "ending": pa.array(ends, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def q_acronyms(sf_dir: str):
    """M9/M10 gate: nested list<struct> variants built per doc, then
    exploded to (doc_id, original, abbreviated) rows."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    endings = ["Inc.", "LLC", "Corporation", "GmbH"]

    def named(batch: pa.Table) -> pa.Table:
        names = []
        for did, t in zip(batch["doc_id"].to_pylist(),
                          batch["text"].to_pylist()):
            toks = t.split(" ")[:3]
            names.append(" ".join(toks) + " " + endings[did % 4])
        return pa.table({"doc_id": batch["doc_id"],
                         "name": pa.array(names, pa.string())})

    with_variants = add_abbreviations(
        ds.map_batches(named, batch_format="pyarrow"))
    # the nested column really exists mid-pipeline (M10's array<struct>)
    return explode_abbreviations(with_variants)


def _sql_stopword_list() -> str:
    return ", ".join(f"'{w}'" for w in sorted(STOP_WORDS))


_ENDING_CASE = ("CASE doc_id % 4 WHEN 0 THEN 'Inc.' WHEN 1 THEN 'LLC' "
                "WHEN 2 THEN 'Corporation' ELSE 'GmbH' END")

ORACLE_SQL: dict[str, str] = {
    "ending_extract": (
        "WITH n AS (SELECT doc_id, "
        "array_to_string(string_split(text, ' ')[1:2], ' ') AS base, "
        f"{_ENDING_CASE} AS ending FROM documents) "
        "SELECT doc_id, base || ' ' || ending AS name, "
        "base AS base_name, ending FROM n"),
    "acronyms": (
        "WITH n AS (SELECT doc_id, string_split(text, ' ')[1:3] AS words, "
        f"{_ENDING_CASE} AS ending FROM documents), "
        "m AS (SELECT doc_id, "
        "array_to_string(words, ' ') || ' ' || ending AS original, ending, "
        "list_filter(words, w -> lower(w) NOT IN "
        f"({_sql_stopword_list()}) AND len(w) > 1) AS mw FROM n), "
        "v AS (SELECT doc_id, original, ending, "
        "array_to_string(list_transform(mw, w -> upper(w[1])), '') AS ab, "
        "array_to_string(list_transform(mw, w -> upper(w[1])), '.') || '.' "
        "AS dotted FROM m WHERE len(mw) > 1) "
        "SELECT doc_id, original, ab AS abbreviated FROM v "
        "WHERE len(ab) > 1 "
        "UNION ALL SELECT doc_id, original, ab || ' ' || ending FROM v "
        "WHERE len(ab) > 1 "
        "UNION ALL SELECT doc_id, original, dotted FROM v "
        "WHERE len(ab) > 1 "
        "UNION ALL SELECT doc_id, original, dotted || ' ' || ending FROM v "
        "WHERE len(ab) > 1"),
}
