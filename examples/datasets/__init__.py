"""Dataset parsers and camera-path utilities for the example trainers.

A regular package (not namespace) so it shadows any installed `datasets`
distribution when `examples/` is first on sys.path.
"""
