"""Ray Data stages: batch transforms, actor pools, and shuffle recipes."""
