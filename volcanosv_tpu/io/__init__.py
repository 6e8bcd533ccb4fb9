from .fasta import read_fasta, write_fasta, FastaIndex
from .fastq import read_fastq, write_fastq
from .bgzf import BgzfReader, BgzfWriter
from .bam import BamReader, BamWriter, BamRecord, CIGAR_OPS
from .vcf import VcfRecord, read_vcf, write_vcf, VcfWriter
from .bed import read_bed
