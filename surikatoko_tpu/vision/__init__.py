from surikatoko_tpu.vision import templ_match as templ_match
from surikatoko_tpu.vision import features as features
from surikatoko_tpu.vision import picture as picture
