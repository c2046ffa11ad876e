from graphik_tpu.io.urdf import UrdfModel, template_from_urdf
