from llp_tpu.parallel.mesh import make_mesh, shard_edges
from llp_tpu.parallel.sharded import (
    make_sharded_spmm,
    make_sharded_teacher_step,
    make_sharded_student_step,
)
from llp_tpu.parallel.epoch import (
    make_halo_teacher_epoch_fn,
    make_sharded_student_epoch_fn,
    make_sharded_teacher_epoch_fn,
)
from llp_tpu.parallel.eval import make_sharded_hits_auc
from llp_tpu.parallel.halo import (
    build_halo_partition,
    make_halo_sage_forward,
    make_halo_spmm,
    make_halo_teacher_step,
    pad_nodes,
)
from llp_tpu.parallel.multihost import initialize_multihost, measure_scaling

__all__ = [
    "make_mesh",
    "shard_edges",
    "make_sharded_spmm",
    "make_sharded_teacher_step",
    "make_sharded_student_step",
    "make_sharded_teacher_epoch_fn",
    "make_sharded_student_epoch_fn",
    "make_halo_teacher_epoch_fn",
    "make_sharded_hits_auc",
    "build_halo_partition",
    "make_halo_spmm",
    "make_halo_sage_forward",
    "make_halo_teacher_step",
    "pad_nodes",
    "initialize_multihost",
    "measure_scaling",
]
