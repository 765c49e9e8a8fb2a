from .tables import load_table, GaussLaguerre, GaussLegendre
from .pdg import SpeciesTable, read_pdg, decode_mcid
from .surface import SurfaceData, read_surface, ThermoAverages
from .deltaf_tables import DeltafTables

__all__ = [
    "load_table",
    "GaussLaguerre",
    "GaussLegendre",
    "SpeciesTable",
    "read_pdg",
    "decode_mcid",
    "SurfaceData",
    "read_surface",
    "ThermoAverages",
    "DeltafTables",
]
