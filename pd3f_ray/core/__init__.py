"""Pure per-document extraction kernel (no Ray dependency).

This package is both the single-process oracle used by the test suite
and the per-row kernel executed inside Ray Data stages.
"""
