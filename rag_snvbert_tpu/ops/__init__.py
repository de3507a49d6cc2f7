from . import l2_ref
from .l2_topk_pallas import (l2_topk_pallas, pack_planar, planar_sq_norms,
                             planar_unpack)
