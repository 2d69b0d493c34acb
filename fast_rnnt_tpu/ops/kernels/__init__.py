from .wavefront import backward_lattice_pallas, forward_lattice_pallas, register

__all__ = ["backward_lattice_pallas", "forward_lattice_pallas", "register"]
