from .fgmres import fgmres, FGMRESResult
from .krylov import cgn, bicgstab, fgcr

__all__ = ["fgmres", "FGMRESResult", "cgn", "bicgstab", "fgcr"]
