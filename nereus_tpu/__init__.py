"""Nereus-TPU: a TPU-native SPH fluid-simulation framework.

A ground-up JAX/XLA rebuild of the capabilities of Mathiasb17/Nereus
(CUDA WCSPH / IISPH / PCISPH with Akinci boundary particles), designed for
TPU: static shapes, one fully-jitted step with zero host sync, sorted
9-segment neighbor gathers, `lax.while_loop` pressure solvers, and
`shard_map`/`ppermute` domain sharding for multi-chip scaling.
"""

from .params import (KernelSet, SimConfig, SimParams, SurfaceTensionModel,
                     dfsph_params, iisph_params, make_params, pbf_params,
                     pcisph_params)
from .grid import Grid, fit_grid, make_grid, refit_grid
from .state import (BoundaryData, FluidState, add_particles,
                    add_particles_traced, make_fluid_state,
                    remove_particles)
from .boundary import move_boundary, rotation_matrix
from .mesh import (load_obj, make_rigid_mesh, mesh_boundary,
                   mesh_mass_properties, sample_surface)
from .rigid import (RigidBody, body_body_contact, body_boundary,
                    concat_boundaries, integrate_rigid,
                    make_rigid_box, wall_contact_force)
from .solvers.coupled import wcsph_coupled_step
from .solvers.elastic import (ElasticParams, ElasticState, ElasticStatics,
                              elastic_params, elastic_step,
                              make_elastic_solid, sample_box_solid)
from .solvers.elastic_coupled import elastic_psi, wcsph_elastic_step
from .solvers.dfsph_coupled import dfsph_coupled_step
from .solvers.dfsph_elastic import dfsph_elastic_step
from .solvers.wcsph import wcsph_step, tait_pressure, cfl_dt
from .solvers.iisph import iisph_step
from .solvers.dfsph import dfsph_step
from .solvers.pbf import pbf_step
from .solvers.pcisph import (pcisph_step, pcisph_delta,
                             pcisph_delta_from_denom, pcisph_grad_denom)

__version__ = "0.1.0"

__all__ = [
    "KernelSet", "SimConfig", "SimParams", "SurfaceTensionModel",
    "dfsph_params", "iisph_params", "make_params", "pbf_params", "pcisph_params",
    "Grid", "fit_grid", "make_grid", "refit_grid",
    "BoundaryData", "FluidState", "add_particles", "add_particles_traced",
    "make_fluid_state", "remove_particles", "move_boundary",
    "rotation_matrix",
    "load_obj", "make_rigid_mesh", "mesh_boundary",
    "mesh_mass_properties", "sample_surface",
    "RigidBody", "body_body_contact", "body_boundary",
    "concat_boundaries", "integrate_rigid", "make_rigid_box",
    "wall_contact_force",
    "wcsph_coupled_step", "dfsph_coupled_step",
    "ElasticParams", "ElasticState", "ElasticStatics", "elastic_params",
    "elastic_step", "make_elastic_solid", "sample_box_solid",
    "elastic_psi", "wcsph_elastic_step", "dfsph_elastic_step",
    "wcsph_step", "tait_pressure", "cfl_dt",
    "iisph_step", "dfsph_step", "pbf_step", "pcisph_step", "pcisph_delta",
    "pcisph_delta_from_denom", "pcisph_grad_denom",
]
