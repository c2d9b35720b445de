"""Generate ``external_bank.nc`` — a NetCDF-4 bank file laid out the way an
INDEPENDENT writer (netCDF4-python / xarray, WRF-style conventions) would
produce it, deliberately different from our own ``export_bank_netcdf``:

  - WRF dimension names (time, bottom_top, south_north, west_east) as real
    HDF5 dimension scales attached to the variable;
  - concentration variable named ``ch4`` with CF packing
    (``scale_factor``/``add_offset``), a ``_FillValue`` masking some cells,
    float64 storage, and NO leading source axis ([T, Z, H, W]);
  - the release point recorded as GLOBAL ATTRIBUTES (release_x/release_y),
    not variables;
  - wind as ``U``/``V`` per-frame series.

``tests/test_fields_ops.py::test_ingest_external_writer_fixture`` reads the
committed artifact; rerun this script only to regenerate it.
"""

import numpy as np

T, Z, H, W = 3, 4, 24, 24
SCALE, OFFSET, FILL = 0.5, 10.0, -9999.0
RELEASE = (8.0, 15.0)


def build(path: str) -> None:
    import h5py

    rng = np.random.default_rng(42)
    t_ax = np.arange(T, dtype="f8")
    z_ax = np.linspace(0.0, 30.0, Z)
    x_ax = np.arange(H, dtype="f8")
    y_ax = np.arange(W, dtype="f8")

    # physical field: a Gaussian blob advecting east with time, decaying in z
    xx, yy = np.meshgrid(x_ax, y_ax, indexing="ij")
    phys = np.empty((T, Z, H, W))
    for t in range(T):
        cx, cy = RELEASE[0] + 2.0 * t, RELEASE[1]
        for z in range(Z):
            phys[t, z] = 80.0 * np.exp(
                -(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 5.0**2))
                - z_ax[z] / 20.0
            )
    packed = (phys - OFFSET) / SCALE          # CF packing: phys = p*scale+offset
    mask = rng.random((T, Z, H, W)) < 0.01    # ~1% missing cells
    packed[mask] = FILL

    with h5py.File(path, "w") as f:
        for name, ax in [("time", t_ax), ("bottom_top", z_ax),
                         ("south_north", x_ax), ("west_east", y_ax)]:
            d = f.create_dataset(name, data=ax)
            d.make_scale(name)
        var = f.create_dataset("ch4", data=packed, dtype="f8")
        for i, name in enumerate(["time", "bottom_top", "south_north", "west_east"]):
            var.dims[i].attach_scale(f[name])
        var.attrs["units"] = np.bytes_("ppb")
        var.attrs["scale_factor"] = np.float64(SCALE)
        var.attrs["add_offset"] = np.float64(OFFSET)
        var.attrs["_FillValue"] = np.float64(FILL)
        f.create_dataset("U", data=np.array([1.0, 1.5, 2.0]))
        f.create_dataset("V", data=np.array([0.0, -0.5, -1.0]))
        f.attrs["release_x"] = np.float64(RELEASE[0])
        f.attrs["release_y"] = np.float64(RELEASE[1])
        f.attrs["Conventions"] = np.bytes_("CF-1.8")


if __name__ == "__main__":
    import os

    build(os.path.join(os.path.dirname(__file__), "external_bank.nc"))
    print("wrote external_bank.nc")
