from .params import count_parameters, param_table

__all__ = ["count_parameters", "param_table"]
