"""Shim — the implementation lives in
chinese_corpus_cleaning_ray.state.compact (packaged so the CLI works from an
installed wheel). Kept for tools/-style invocation compatibility.

Usage: PYTHONPATH=. python tools/compact.py <output_dir>
"""

import sys

from chinese_corpus_cleaning_ray.state.compact import compact  # noqa: F401

if __name__ == "__main__":
    print(compact(sys.argv[1]))
