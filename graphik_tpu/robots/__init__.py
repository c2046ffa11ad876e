from graphik_tpu.robots.templates import (
    RobotTemplate,
    revolute_from_dh,
    revolute_from_t_zero,
    planar_from_links,
)
from graphik_tpu.robots import kinematics
