from graphik_tpu.graphs.problem import ProblemStructure
