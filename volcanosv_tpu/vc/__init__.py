from .signatures import Signature, extract_contig_signatures, cluster_sigs
from .pairing import pair_haplotype_sigs
