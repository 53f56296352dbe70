from .step import physics_step, StepInfo  # noqa: F401
from .kinematics import forward_kinematics  # noqa: F401
from .dynamics import crba, rnea_bias, forward_dynamics, integrate, mass_matrix, jacobian_body  # noqa: F401
from .collide import build_ground_contacts, ground_contact_forces, ContactSet  # noqa: F401
from .actuation import actuator_torque  # noqa: F401
