"""Plans: stage snapshot / lineage / resume layer (SURVEY §7 step 7)."""

from .snapshot import SnapshotStore, StageResult  # noqa: F401
