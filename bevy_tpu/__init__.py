"""bevy_tpu — a TPU-native simulation & rendering framework with Bevy's
capabilities, built from scratch on JAX/XLA/Pallas.

See SURVEY.md for the reference analysis and ARCHITECTURE.md for the design.
"""

__version__ = "0.1.0"

from bevy_tpu.app import App, Plugin, AppExit  # noqa: F401
from bevy_tpu.app.main_schedule import (  # noqa: F401
    First, PreUpdate, StateTransition, RunFixedMainLoop, Update, SpawnScene,
    PostUpdate, Last, Startup, PreStartup, PostStartup, FixedUpdate,
    FixedFirst, FixedPreUpdate, FixedPostUpdate, FixedLast, Main,
)
from bevy_tpu.ecs import (  # noqa: F401
    component, field, resource, World, system, host_system, Schedule, Query,
    QueryBuilder,
    Read, Res, ResMut, Local, With, Without, Changed, Added, Removed,
    Commands, Entity, message, MessageReader, MessageWriter,
)
from bevy_tpu.ecs.observer import (  # noqa: F401
    LifecycleMask, On, OnAdd, OnInsert, OnRemove, Trigger, event,
)
from bevy_tpu.state import (  # noqa: F401
    CurrentState, NextState, OnEnter, OnExit, add_state, in_state,
)
