from diffdock_tpu.eval.rmsd import symmetry_rmsd, simple_rmsd
from diffdock_tpu.eval.metrics import DockingMetrics, compute_metric_table

__all__ = ["symmetry_rmsd", "simple_rmsd", "DockingMetrics", "compute_metric_table"]
