"""``python -m eridu_ray`` entry point (reference installs `eridu` as a
console script via pyproject; this repo is not pip-installed, so the
module runner is the equivalent surface)."""

from eridu_ray.cli import main

main()
