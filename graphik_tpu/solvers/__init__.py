from graphik_tpu.solvers import costs, riemannian
