from graphik_tpu.utils import lie, dgp, geometry
