"""Schedule labels & Main order (reference twin: bevy_app
main_schedule.rs:57-200 — First → PreUpdate → StateTransition →
RunFixedMainLoop(FixedMain×N) → Update → SpawnScene → PostUpdate → Last,
plus the startup trio and the render labels appended by the render plugin).
"""


class ScheduleLabel(str):
    def __repr__(self):
        return f"<{str(self)}>"


Main = ScheduleLabel("Main")

PreStartup = ScheduleLabel("PreStartup")
Startup = ScheduleLabel("Startup")
PostStartup = ScheduleLabel("PostStartup")

First = ScheduleLabel("First")
PreUpdate = ScheduleLabel("PreUpdate")
StateTransition = ScheduleLabel("StateTransition")
RunFixedMainLoop = ScheduleLabel("RunFixedMainLoop")
Update = ScheduleLabel("Update")
SpawnScene = ScheduleLabel("SpawnScene")
PostUpdate = ScheduleLabel("PostUpdate")
Last = ScheduleLabel("Last")

FixedFirst = ScheduleLabel("FixedFirst")
FixedPreUpdate = ScheduleLabel("FixedPreUpdate")
FixedUpdate = ScheduleLabel("FixedUpdate")
FixedPostUpdate = ScheduleLabel("FixedPostUpdate")
FixedLast = ScheduleLabel("FixedLast")

# Render sub-app labels (ref: ExtractSchedule + Render schedule,
# bevy_render/src/lib.rs:158-212). Appended after Last by RenderPlugin —
# sim and render fuse into one jit (ARCHITECTURE.md frame anatomy).
ExtractSchedule = ScheduleLabel("ExtractSchedule")
Render = ScheduleLabel("Render")

MAIN_ORDER = [First, PreUpdate, StateTransition, RunFixedMainLoop, Update,
              SpawnScene, PostUpdate, Last]
STARTUP_ORDER = [PreStartup, Startup, PostStartup]
FIXED_MAIN_ORDER = [FixedFirst, FixedPreUpdate, FixedUpdate, FixedPostUpdate,
                    FixedLast]
