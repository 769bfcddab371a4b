from mjlab_tpu.envs.mdp.observations import *  # noqa: F401,F403
from mjlab_tpu.envs.mdp.rewards import *  # noqa: F401,F403
from mjlab_tpu.envs.mdp.terminations import *  # noqa: F401,F403
from mjlab_tpu.envs.mdp.events import *  # noqa: F401,F403
from mjlab_tpu.envs.mdp.actions import *  # noqa: F401,F403
