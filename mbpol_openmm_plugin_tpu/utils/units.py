"""Unit constants, centralized.

The reference scatters conversions through the physics code (e.g.
``* cal2joule * -10`` force conversions, MBPolReferenceTwoBodyForce.cpp:276).
Here every conversion factor lives in one place. Internal units are OpenMM's:
nm / kJ/mol / amu / e / ps.
"""

NM_TO_ANGSTROM = 10.0
ANGSTROM_TO_NM = 0.1
CAL_TO_JOULE = 4.184          # thermochemical calorie
KCAL_PER_MOL_TO_KJ_PER_MOL = 4.184
KJ_PER_MOL_TO_KCAL_PER_MOL = 1.0 / 4.184

# Coulomb constant in OpenMM internal units: (kJ/mol)*nm/e^2
# (value used by the reference: MBPolReferenceElectrostaticsForce.cpp:50)
ELECTRIC = 138.9354558456

# Debye conversion used by the SCF convergence test
# (MBPolReferenceElectrostaticsForce.cpp:58)
DEBYE = 48.033324

# cm^-1 -> kcal/mol for the Partridge-Schwenke monomer PES
# (derived CODATA-2010 chain, mbpol_interaction_constants.h:22)
# loaded from data/onebody.npz at runtime; kept here for reference only.

# Boltzmann constant, kJ/(mol*K) (CODATA)
BOLTZMANN_KJ_MOL_K = 8.31446261815324e-3
