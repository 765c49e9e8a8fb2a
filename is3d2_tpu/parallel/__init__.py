from .sharding import make_mesh, sharded_spectra

__all__ = ["make_mesh", "sharded_spectra"]
