from tpu_plume.fields.analytic import (
    FieldState,
    materialize_fields,
    new_field,
    sample_conc_tke,
)

__all__ = ["FieldState", "materialize_fields", "new_field", "sample_conc_tke"]
