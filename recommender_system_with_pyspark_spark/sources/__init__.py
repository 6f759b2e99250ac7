from .synthetic import SyntheticRatingsDataSource

__all__ = ["SyntheticRatingsDataSource"]
