from .correlation_pallas import correlate_pallas

__all__ = ['correlate_pallas']
