from .fgmres import fgmres, fgmres_mp, FGMRESResult
from .krylov import cgn, bicgstab, fgcr

__all__ = ["fgmres", "fgmres_mp", "FGMRESResult", "cgn", "bicgstab", "fgcr"]
