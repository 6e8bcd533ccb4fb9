from .banded_dp import banded_align_pallas, pallas_available

__all__ = ["banded_align_pallas", "pallas_available"]
