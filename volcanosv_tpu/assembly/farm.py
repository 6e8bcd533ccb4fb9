"""Per-haplotype assembly farm.

ref: General_Assembly_Workflow.py run_assembly/run_assembly_one_folder —
joblib fan-out of one assembler process per phase-block haplotype, contig
renaming to <hap_name>_<n> (reformat_fasta :37-45), resumable via
log.txt/fail_log.txt skip lists (:530-547), final concat (:565-566).

Here: in-process farm over hap groups; failures (empty assemblies) are
recorded and tolerated, like the reference's fail_log."""
from __future__ import annotations

from ..config import AssemblyConfig
from ..utils.logging import get_logger
from .olc import assemble_block

log = get_logger("assembly_farm")


def run_assembly(groups: dict[str, list[str]], cfg: AssemblyConfig,
                 ) -> tuple[dict[str, str], list[str]]:
    """groups: hap_name → read seqs.  Returns (contigs {name: seq},
    failed hap names).  Contig naming: <hap_name>_<n>."""
    contigs: dict[str, str] = {}
    failed: list[str] = []
    for hap_name in sorted(groups):
        seqs = groups[hap_name]
        try:
            res = assemble_block(seqs, cfg)
        except Exception as e:          # tolerate per-hap failure
            log.warning("assembly failed for %s: %s", hap_name, e)
            failed.append(hap_name)
            continue
        if not res.contigs:
            failed.append(hap_name)
            continue
        for n, seq in enumerate(res.contigs):
            contigs[f"{hap_name}_{n}"] = seq
    log.info("assembled %d contigs from %d hap groups (%d failed)",
             len(contigs), len(groups), len(failed))
    return contigs, failed
