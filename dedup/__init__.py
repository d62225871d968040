"""dedup — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch re-derivation of the record-matching semantics of the
reference ``Danieljvdw/DuplicateDetector`` (see SURVEY.md) over Parquet
tables of Common-Crawl-style web pages, built on ``ray.data.Dataset``
pipelines: vectorized ``map_batches`` over zero-copy Arrow batches,
actor pools for stateful signer stages, and groupby/aggregate shuffles
for the wide steps (exact blocking, LSH banding, distributed
union-find).

Public surface:
    - :mod:`dedup.config`     — PipelineConfig (the reference's settings table)
    - :mod:`dedup.pipeline`   — end-to-end dedup pipelines (exact / near / full)
    - :mod:`dedup.synth`      — deterministic pages-corpus generator (FIXTURES.md)
    - :mod:`dedup.oracle`     — single-process greedy reference oracle (tests)
"""

__version__ = "0.1.0"


def _shim_broken_fsspec() -> None:
    """This environment ships fsspec without aiohttp, so importing
    ``fsspec.implementations.http`` fails mid-module; repeated imports can
    then surface as plain ImportError ("cannot import name"), which Ray's
    local-path resolution doesn't guard against — crashing local
    read_parquet calls nondeterministically.  Preinstall a stub module
    exposing a never-instantiated HTTPFileSystem placeholder so the
    isinstance probe in ray.data works."""
    import sys
    import types
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return  # real one works
    except Exception:
        pass
    mod = types.ModuleType("fsspec.implementations.http")
    mod.HTTPFileSystem = type("HTTPFileSystem", (), {})
    sys.modules["fsspec.implementations.http"] = mod


_shim_broken_fsspec()
