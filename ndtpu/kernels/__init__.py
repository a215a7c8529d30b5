from ndtpu.kernels.ndt_score import point_terms_pallas

__all__ = ["point_terms_pallas"]
