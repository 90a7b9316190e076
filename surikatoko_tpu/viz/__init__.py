from surikatoko_tpu.viz import scene_view as scene_view
from surikatoko_tpu.viz import gl_helpers as gl_helpers
from surikatoko_tpu.viz import draw2d as draw2d
