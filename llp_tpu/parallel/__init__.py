from llp_tpu.parallel.mesh import make_mesh, shard_edges
from llp_tpu.parallel.sharded import (
    make_sharded_spmm,
    make_sharded_teacher_step,
    make_sharded_student_step,
)

__all__ = [
    "make_mesh",
    "shard_edges",
    "make_sharded_spmm",
    "make_sharded_teacher_step",
    "make_sharded_student_step",
]
