from bwamem_tpu.parallel.mesh import make_mesh, rowmap, replicated  # noqa: F401
