"""rapidcfd_tpu — a TPU-native unstructured finite-volume CFD framework.

Re-founds the capability surface of RapidCFD/OpenFOAM (reference:
SimFlowCFD/RapidCFD-dev, see SURVEY.md) on JAX/XLA/Pallas:

- OpenFOAM case format in: dictionaries, polyMesh, field files
  (``utils.dictionary``, ``mesh.polymesh``, ``fields.io``).
- A static, padded, SoA mesh (``mesh.mesharrays``): cells renumbered
  (Cuthill-McKee), face connectivity packed into an ELL layout so every
  finite-volume operator is a regular gather + masked segment-sum.
- fvc/fvm operator namespaces producing explicit fields and implicit
  ``FvMatrix`` systems (``ops``), boundary conditions as pure per-patch
  coefficient functions (``fields.bcs``).
- Krylov/multigrid linear solvers as fully jitted ``lax.while_loop``
  iterations (``linalg``).
- SIMPLE/PISO/PIMPLE solvers (``solvers``) with physics models
  (``models``: transport, turbulence, thermo).
- Multi-chip domain decomposition via ``jax.shard_map`` halo exchange
  (``parallel``) replacing the reference's MPI processor patches.
"""

__version__ = "0.1.0"
