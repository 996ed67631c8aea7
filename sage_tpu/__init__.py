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
