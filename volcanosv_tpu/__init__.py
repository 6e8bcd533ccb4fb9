"""volcanosv_tpu — a TPU-native structural-variant engine.

A from-scratch reimplementation of the capabilities of VolcanoSV
(maiziezhoulab/VolcanoSV) as a single JAX/XLA/Pallas framework:

* SNP calling + read-backed phasing      (replaces longshot;      ref: bin/VolcanoSV-asm/volcanosv-asm.py:75-80)
* k-mer haplotype partitioning of reads  (replaces L2 scripts;    ref: bin/VolcanoSV-asm/unphased_reads_assignment_kmer_norm.py)
* local de novo assembly per phase block (replaces hifiasm/flye;  ref: bin/VolcanoSV-asm/General_Assembly_Workflow.py)
* contig→reference alignment             (replaces minimap2;      ref: bin/VolcanoSV-vc/Large_INDEL/Raw_variant_call.py:46-58)
* large-indel calling                    (ref: bin/VolcanoSV-vc/Large_INDEL/extract_contig_signature_Hifi.py)
* small-indel calling                    (replaces htsbox+dipcall; ref: bin/VolcanoSV-vc/Small_INDEL/)
* complex SV calling (DUP/INV/TRA)       (replaces svim-asm;      ref: bin/VolcanoSV-vc/Complex_SV/)

All compute-dense inner loops run on TPU (Pallas kernels / jitted XLA);
host code does streaming I/O and ragged-batch marshalling only.
"""

__version__ = "0.1.0"


def _configure_jax() -> None:
    """Persistent compilation cache: the aligner launches a small family of
    bucket-shaped DP kernels; caching compiles across processes matters on
    remote-compile TPU setups."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_configure_jax()
