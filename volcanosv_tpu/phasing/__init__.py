from .pileup import PileupResult, pileup_chromosome
from .phase import PhaseResult, phase_chromosome
