"""NetCDF-4 trajectory dataset writer/reader (h5py backend).

Schema parity with the reference ``NetCDFWriter`` (PPOV2.0/netcdf_writer.py:
4-118; V2.1 extension with gaussian_sigma/peak_concentration,
PPOV2.1/model.py:351-422) and its committed artifact description
(PPOV2.1/nc_info.txt:1-48):

    dims:  episode (max_episodes), step (max_steps)
    vars:  episode i32[episode]; step i32[step];
           x, y, concentration f32[episode, step]  (_FillValue NaN, zlib);
           is_source i8[episode, step]             (_FillValue 0, zlib);
           source_concentration, source_x, source_y f32[episode] (_FillValue NaN);
           gaussian_sigma, peak_concentration f32[episode]        (V2.1)
    attrs: GRID_SIZE (global); units/long_name per variable.

NetCDF-4 *is* HDF5: this module writes genuine NetCDF-4-compatible files via
h5py using HDF5 dimension scales + gzip, so the artifacts open with
netCDF4-python/xarray where available, without requiring the netCDF4 package
in this environment.
"""

from __future__ import annotations

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover - h5py is present in the target env
    h5py = None


_VAR_META = {
    "episode": dict(long_name="Training episode index"),
    "step": dict(long_name="Step index within episode"),
    "x": dict(units="grid unit", long_name="Agent x-coordinate"),
    "y": dict(units="grid unit", long_name="Agent y-coordinate"),
    "concentration": dict(long_name="Methane concentration"),
    "is_source": dict(long_name="Source position flag"),
    "source_concentration": dict(long_name="Actual source concentration in each episode"),
    "source_x": dict(long_name="Actual source x-coordinate"),
    "source_y": dict(long_name="Actual source y-coordinate"),
    "gaussian_sigma": dict(long_name="Gaussian distribution standard deviation"),
    "peak_concentration": dict(units="ppm", long_name="Source peak concentration"),
}


class NetCDFWriter:
    """Drop-in equivalent of the reference writer.

    ``with_gaussian_params=True`` adds the V2.1 per-episode sigma/peak
    variables (PPOV2.1/model.py:394-403)."""

    def __init__(
        self,
        filename: str,
        grid_size: int,
        max_episodes: int = 2000,
        max_steps: int = 1000,
        with_gaussian_params: bool = False,
    ):
        if h5py is None:
            raise RuntimeError("h5py is required for NetCDF output")
        self.filename = filename
        self.max_episodes = max_episodes
        self.max_steps = max_steps
        self.with_gaussian_params = with_gaussian_params

        f = h5py.File(filename, "w")
        self._f = f
        f.attrs["GRID_SIZE"] = np.int64(grid_size)

        # Coordinate variables double as NetCDF dimensions (HDF5 dim scales).
        ep = f.create_dataset("episode", data=np.arange(max_episodes, dtype=np.int32))
        st = f.create_dataset("step", data=np.arange(max_steps, dtype=np.int32))
        ep.make_scale("episode")
        st.make_scale("step")
        self._scales = {"episode": ep, "step": st}

        for name in ("x", "y", "concentration"):
            self._create(name, ("episode", "step"), np.float32, np.nan)
        self._create("is_source", ("episode", "step"), np.int8, np.int8(0))
        for name in ("source_concentration", "source_x", "source_y"):
            self._create(name, ("episode",), np.float32, np.nan)
        if with_gaussian_params:
            self._create("gaussian_sigma", ("episode",), np.float32, None)
            self._create("peak_concentration", ("episode",), np.float32, None)
        self._attach_meta()

    def _create(self, name, dims, dtype, fill):
        shape = tuple(len(self._scales[d]) for d in dims)
        kw = dict(compression="gzip", compression_opts=4, chunks=True)
        ds = self._f.create_dataset(name, shape=shape, dtype=dtype, fillvalue=fill, **kw)
        if fill is not None:
            ds.attrs["_FillValue"] = np.array(fill, dtype=dtype)
        for i, d in enumerate(dims):
            ds.dims[i].attach_scale(self._scales[d])

    def _attach_meta(self):
        for name, meta in _VAR_META.items():
            if name in self._f:
                for k, v in meta.items():
                    self._f[name].attrs[k] = v

    def write_episode_data(
        self,
        episode_idx: int,
        steps: int,
        x: np.ndarray,
        y: np.ndarray,
        conc: np.ndarray,
        source_x: float,
        source_y: float,
        source_conc: float,
        sigma: float | None = None,
        peak: float | None = None,
    ):
        """Reference write_episode_data (netcdf_writer.py:89-114): per-step
        arrays up to ``steps``, final step overwritten with the source
        coordinates and flagged in ``is_source``."""
        f = self._f
        f["x"][episode_idx, :steps] = np.asarray(x, np.float32)
        f["y"][episode_idx, :steps] = np.asarray(y, np.float32)
        f["concentration"][episode_idx, :steps] = np.asarray(conc, np.float32)
        f["is_source"][episode_idx, steps - 1] = 1
        f["x"][episode_idx, steps - 1] = source_x
        f["y"][episode_idx, steps - 1] = source_y
        f["source_concentration"][episode_idx] = source_conc
        f["source_x"][episode_idx] = source_x
        f["source_y"][episode_idx] = source_y
        if self.with_gaussian_params:
            f["gaussian_sigma"][episode_idx] = 15.0 if sigma is None else sigma
            f["peak_concentration"][episode_idx] = 100.0 if peak is None else peak

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_nc(path: str) -> dict[str, np.ndarray]:
    """Load every variable of a trajectory file into memory."""
    out = {}
    with h5py.File(path, "r") as f:
        for name in f:
            out[name] = np.asarray(f[name])
        out["__attrs__"] = dict(f.attrs)
    return out


def describe_nc(path: str) -> str:
    """Text dump of dims/vars/attrs/min-max — the reference's
    ``check_nc_info.py`` inspector (PPOV2.1/check_nc_info.py:1-23, output
    format preserved from nc_info.txt)."""
    lines = []
    with h5py.File(path, "r") as f:
        ep = f["episode"].shape[0]
        st = f["step"].shape[0]
        lines.append("dims:")
        lines.append(f"  episode: {ep}")
        lines.append(f"  step: {st}")
        lines.append("")
        lines.append("variables:")
        for name in f:
            ds = f[name]
            lines.append(f"  {name}: shape={ds.shape}, dtype={ds.dtype}")
            for k, v in ds.attrs.items():
                if k in ("DIMENSION_LIST", "CLASS", "NAME", "REFERENCE_LIST"):
                    continue
                lines.append(f"    {k}: {v}")
            data = np.asarray(ds)
            if np.issubdtype(data.dtype, np.floating):
                valid = data[~np.isnan(data)]
            else:
                valid = data[data != 0] if name == "is_source" else data
            if valid.size:
                lines.append(f"    min={valid.min()}, max={valid.max()}")
        lines.append("")
        lines.append("file check complete.")
    return "\n".join(lines)
