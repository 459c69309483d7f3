"""Plans: stage snapshot / lineage / resume layer (SURVEY §7 step 7)."""

from .iceberg_meta import (  # noqa: F401
    IcebergSnapshot,
    IcebergTable,
    read_iceberg_table,
    write_fixture_iceberg_table,
)
from .snapshot import SnapshotStore, StageResult  # noqa: F401
