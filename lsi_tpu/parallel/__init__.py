from lsi_tpu.parallel.mesh import (  # noqa: F401
    MeshPlan,
    make_mesh_plan,
)
