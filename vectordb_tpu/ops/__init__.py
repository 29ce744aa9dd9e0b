from .flat import flat_topk, flat_distances, exact_rerank

__all__ = ["flat_topk", "flat_distances", "exact_rerank"]
