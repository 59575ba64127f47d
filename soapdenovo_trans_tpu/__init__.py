"""TPU-native de novo transcriptome assembler.

A ground-up JAX/XLA reimplementation of the capabilities of
SOAPdenovo-Trans (reference surveyed in SURVEY.md): de Bruijn graph
construction from RNA-seq reads, graph cleaning, contig assembly,
read mapping, and transcript scaffolding — with array-parallel
algorithms (sort-based k-mer dictionaries, list-ranking condensation,
masked fixpoint cleaning) in place of the reference's pointer-chasing
C, and device-mesh sharding in place of pthreads.
"""

__version__ = "0.1.0"
