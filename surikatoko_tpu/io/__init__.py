from surikatoko_tpu.io import mat_io as mat_io
from surikatoko_tpu.io import dino as dino
