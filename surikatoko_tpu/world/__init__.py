from surikatoko_tpu.world import scene_gen as scene_gen
from surikatoko_tpu.world import demo_matcher as demo_matcher
