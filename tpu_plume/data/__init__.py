from tpu_plume.data.netcdf import NetCDFWriter, describe_nc, read_nc
from tpu_plume.data.datasets import (
    calculate_dynamic_label,
    load_enhanced_samples,
    load_raw_sequences,
    load_trajectory_segments,
)
from tpu_plume.data.scaler import MinMaxScaler
from tpu_plume.data.expert import load_expert_data, save_expert_data

__all__ = [
    "NetCDFWriter",
    "describe_nc",
    "read_nc",
    "calculate_dynamic_label",
    "load_enhanced_samples",
    "load_raw_sequences",
    "load_trajectory_segments",
    "MinMaxScaler",
    "load_expert_data",
    "save_expert_data",
]
