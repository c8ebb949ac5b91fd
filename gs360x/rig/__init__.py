"""View-rig presets and the addcam/delcam/setcam camera grammar."""

from gs360x.rig.spec import ViewSpec, RenderPlan, PlanJob  # noqa: F401
from gs360x.rig.presets import (  # noqa: F401
    PerspCutConfig, build_view_plan, PRESET_CHOICES,
)
