"""vcf2prot_tpu: a TPU-native personalized-proteome engine.

Takes a reference proteome FASTA and a phased, bcftools/csq-annotated VCF and
emits one FASTA per sample containing that sample's personalized proteome
(both haplotypes). Capability-parity rebuild of ikmb/vcf2prot with a
JAX/XLA/Pallas execution core.
"""

__version__ = "0.1.0"
