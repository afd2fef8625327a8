from .celldata import CellData

__all__ = ["CellData"]
