from surikatoko_tpu.utils import approx as approx
from surikatoko_tpu.utils import stats as stats
from surikatoko_tpu.utils import rand as rand
from surikatoko_tpu.utils import la as la
