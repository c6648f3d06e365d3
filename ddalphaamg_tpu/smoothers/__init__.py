from .sap import SchwarzPreconditioner

__all__ = ["SchwarzPreconditioner"]
