"""Task registry — name → class map (reference `tasks/__init__.py:52-73`)."""


def _lazy(module, cls):
    def load(*a, **kw):
        import importlib
        m = importlib.import_module(f"isaacgymenvs_tpu.envs.{module}")
        return getattr(m, cls)(*a, **kw)
    load.__name__ = cls
    return load


isaacgym_task_map = {
    "Cartpole": _lazy("cartpole", "Cartpole"),
    "Ant": _lazy("ant", "Ant"),
    "Humanoid": _lazy("humanoid", "Humanoid"),
    "Anymal": _lazy("anymal", "Anymal"),
    "AnymalTerrain": _lazy("anymal_terrain", "AnymalTerrain"),
    "A1Terrain": _lazy("a1_terrain", "A1Terrain"),
    "BallBalance": _lazy("ball_balance", "BallBalance"),
    "Ingenuity": _lazy("ingenuity", "Ingenuity"),
    "Quadcopter": _lazy("quadcopter", "Quadcopter"),
    "ShadowHand": _lazy("shadow_hand", "ShadowHand"),
    # OpenAI obs variants: same class, cfg/task/ShadowHandOpenAI_*.yaml
    # (reference tasks/__init__.py maps both names to ShadowHand)
    "ShadowHandOpenAI_FF": _lazy("shadow_hand", "ShadowHand"),
    "ShadowHandOpenAI_LSTM": _lazy("shadow_hand", "ShadowHand"),
    "AllegroHand": _lazy("allegro_hand", "AllegroHand"),
    "HumanoidAMP": _lazy("humanoid_amp", "HumanoidAMP"),
    "FrankaCabinet": _lazy("franka_cabinet", "FrankaCabinet"),
    "FrankaCubeStack": _lazy("franka_cube_stack", "FrankaCubeStack"),
    "Trifinger": _lazy("trifinger", "Trifinger"),
    "FactoryTaskNutBoltPick": _lazy("factory.task_nut_bolt_pick",
                                    "FactoryTaskNutBoltPick"),
    "FactoryTaskNutBoltPlace": _lazy("factory.task_nut_bolt_place",
                                     "FactoryTaskNutBoltPlace"),
    "FactoryTaskNutBoltScrew": _lazy("factory.task_nut_bolt_screw",
                                     "FactoryTaskNutBoltScrew"),
    "FactoryTaskInsertion": _lazy("factory.task_insertion",
                                  "FactoryTaskInsertion"),
    "FactoryTaskGears": _lazy("factory.task_insertion",
                              "FactoryTaskGears"),
}

from .base import VecTask, EnvState, TimeStep  # noqa: F401,E402
