"""bevy_tpu.ecs — the core runtime (reference twin: bevy_ecs, SURVEY.md §2.1).

World = global dense SoA pools in HBM; systems = pure functions composed
into one jitted step; see ARCHITECTURE.md.
"""

from bevy_tpu.ecs.component import (  # noqa: F401
    component, field, resource, ComponentSpec, ComponentInstance, get_spec,
)
from bevy_tpu.ecs.entity import Entity, NULL_ENTITY  # noqa: F401
from bevy_tpu.ecs.world import World  # noqa: F401
from bevy_tpu.ecs.query import (  # noqa: F401
    Query, QueryBuilder, Read, Res, ResMut, Local,
)
from bevy_tpu.ecs.system import system, host_system, System  # noqa: F401
from bevy_tpu.ecs.schedule import Schedule  # noqa: F401
from bevy_tpu.ecs.commands import Commands  # noqa: F401
from bevy_tpu.ecs.message import (  # noqa: F401
    message, MessageReader, MessageWriter, swap_message_buffers,
)

# Positional query filters (ref: With/Without/Changed/Added filter types);
# also available as Query keyword args (`with_=`, `without=`, ...).


class Changed:
    def __init__(self, comp):
        self.comp = comp


class Added:
    def __init__(self, comp):
        self.comp = comp


class With:  # noqa: F811
    def __init__(self, comp):
        self.comp = comp


class Without:
    def __init__(self, comp):
        self.comp = comp


class Removed:
    """Matches entities whose component was removed since the system last
    ran (ref: RemovedComponents, bevy_ecs removal_detection)."""

    def __init__(self, comp):
        self.comp = comp
