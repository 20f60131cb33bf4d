from .parity import TaxiParityDriver, reference_rng

__all__ = ["TaxiParityDriver", "reference_rng"]
