"""UDFs resolved by dotted path from the YAML pipeline test (the
reference's dummy_functions.py analogue)."""

import pyarrow as pa
import pyarrow.compute as pc


def uppercase_output(batch: pa.Table) -> pa.Table:
    i = batch.schema.get_field_index("output")
    return batch.set_column(i, "output", pc.utf8_upper(batch.column("output")))


def add_exclamation(batch: pa.Table) -> pa.Table:
    i = batch.schema.get_field_index("output")
    vals = pc.binary_join_element_wise(batch.column("output"), "!", "")
    return batch.set_column(i, "output", vals)
