"""Pure, seed-deterministic numeric kernels (no Ray imports).

Unit-tested directly (SURVEY.md §5) and shared between the pipeline and the
ground-truth generator so signature config can never drift between the two
(BASELINE.md: recall is defined at identical shingle/signature config).
"""
