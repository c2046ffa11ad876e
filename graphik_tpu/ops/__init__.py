from graphik_tpu.ops import linalg
