"""Schema utilities: column-convention detection (SURVEY.md §2 M14).

The reference autodetects which pair-column convention a table uses —
``(name1, name2, label)`` vs ``(left_name, right_name, match)`` —
before building its pipeline (eridu/etl/cluster_split.py:159-168).
Same operator here, over ``Dataset.schema()`` / pyarrow schemas, plus
the pages-table variant (html-vs-text input sniff used by the signature
stage).
"""

from __future__ import annotations

PAIR_CONVENTIONS = [
    {"a": "name1", "b": "name2", "label": "label"},
    {"a": "left_name", "b": "right_name", "label": "match"},
    # engine-native candidate-pair convention
    {"a": "url_a", "b": "url_b", "label": "match"},
]


def detect_pair_columns(columns) -> dict:
    """Return the {'a','b','label'} mapping for a pair table.

    ``columns`` is any iterable of column names (or an object with
    ``.names`` like a pyarrow schema).  Raises ValueError when no known
    convention matches — the reference's explicit failure mode.
    """
    names = set(getattr(columns, "names", columns))
    for conv in PAIR_CONVENTIONS:
        if {conv["a"], conv["b"]} <= names:
            return dict(conv, has_label=conv["label"] in names)
    raise ValueError(
        f"no known pair-column convention in {sorted(names)}; expected "
        "one of " + " | ".join(
            f"({c['a']}, {c['b']}[, {c['label']}])"
            for c in PAIR_CONVENTIONS))


def detect_text_column(columns) -> str:
    """Pages-table sniff: prefer raw 'html' (extraction runs) over
    pre-extracted 'text' (signatures.py input convention)."""
    names = set(getattr(columns, "names", columns))
    if "html" in names:
        return "html"
    if "text" in names:
        return "text"
    raise ValueError(f"neither 'html' nor 'text' in {sorted(names)}")
