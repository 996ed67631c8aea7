"""sage_tpu — a TPU-native proteomics search engine.

A from-scratch reimplementation of the capabilities of the Sage search
engine (lazear/sage), designed TPU-first: the in-silico digest compiles
into dense HBM-resident peptide/fragment tables, candidate scoring runs
as batched JAX/Pallas kernels over padded spectrum batches, and the
rescoring/FDR stack (LDA, KDE PEP, picked target-decoy competition) is
pure linear algebra on device. Multi-chip scale-out uses
``jax.sharding.Mesh`` with data-parallel spectra and a mass-range-sharded
peptide table.
"""

__version__ = "0.1.0"

__all__ = [
    "DatabaseParams",
    "IndexedDatabase",
    "Scorer",
    "SearchParams",
    "Runner",
    "ShardedScorer",
    "make_mesh",
    "maybe_init_distributed",
    "build_search",
    "load_config",
    "save_database",
    "load_database",
]


def __getattr__(name):
    # Lazy re-exports: importing sage_tpu stays cheap (no jax import)
    # until a search-facing symbol is touched — the sagepy-style Python
    # API surface (README "Library boundary").
    if name in ("DatabaseParams", "IndexedDatabase", "save_database", "load_database"):
        from .index import builder

        return getattr(builder, name)
    if name in ("Scorer", "SearchParams"):
        from .ops import search

        return getattr(search, name)
    if name == "Runner":
        from .pipeline.runner import Runner

        return Runner
    if name in ("ShardedScorer", "make_mesh"):
        from .parallel import sharding

        return getattr(sharding, name)
    if name == "maybe_init_distributed":
        from .parallel.multihost import maybe_init_distributed

        return maybe_init_distributed
    if name in ("build_search", "load_config"):
        from .pipeline import input as _input

        return getattr(_input, name)
    raise AttributeError(name)
