from .dates import date_dimension, iso_day_of_week, season

__all__ = ["date_dimension", "iso_day_of_week", "season"]
