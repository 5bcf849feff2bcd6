from .units import (
    cluster_id,
    pp_bytes,
    pp_number,
    pp_number_to_units,
    pp_size_to_bytes,
    pp_time,
    pp_time_to_ns,
)

__all__ = [
    "pp_size_to_bytes",
    "pp_number_to_units",
    "pp_time_to_ns",
    "pp_bytes",
    "pp_number",
    "pp_time",
    "cluster_id",
]
