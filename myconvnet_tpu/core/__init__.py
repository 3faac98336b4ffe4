from myconvnet_tpu.core import init as initializers
from myconvnet_tpu.core.module import (Params, State, Transformed, auto_name,
                                       collecting, get_state, in_init,
                                       next_rng_key, overriding, param,
                                       scope, set_state, tag_intermediate,
                                       transform)
from myconvnet_tpu.core.precision import (BF16, FULL, Policy, current_policy,
                                          get_policy, policy_scope,
                                          set_policy)

__all__ = [
    "Params", "State", "Transformed", "auto_name", "get_state", "in_init",
    "next_rng_key", "param", "scope", "set_state", "transform",
    "collecting", "overriding", "tag_intermediate",
    "initializers", "BF16", "FULL", "Policy", "current_policy", "get_policy",
    "policy_scope", "set_policy",
]
