from . import collapsed, dp, mesh, pp
from .dp import (dp_elbo, dp_predict_y, make_dp_sp_scan_train_step,
                 make_dp_train_step, sp_elbo)
from .collapsed import (collapsed_shard, damianou_shard, dp_collapsed_elbo,
                        dp_damianou_elbo, make_dp_collapsed_train_step,
                        make_dp_damianou_train_step)
from .mesh import make_mesh, pad_to_multiple, replicate, shard_along
from .pp import make_pp_train_step, pp_elbo, pp_shard, pp_stack
