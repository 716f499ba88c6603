#!/usr/bin/env python
"""Regenerate the packaged XML parameter files from the extracted tables.

Writes into mbpol_openmm_plugin_tpu/app/, in the reference's XML format:
  - mbpol.xml                 (canonical; python/mbpol.xml)
  - mbpol_no_custom_dispersion_no_charge_redistribution.xml
        (variant: no dispersion <Script>, charge redistribution disabled;
         python/mbpol_no_custom_dispersion_no_charge_redistribution.xml)
  - customdispersion.xml      (variant: dispersion-only force field;
         python/customdispersion.xml)
so user force-field files and ours are interchangeable. The dispersion
tables are emitted in the same embedded-script convention the reference
uses (our ForceField extracts the tables from the script text).
"""
import os
import numpy as np

from_dir = os.path.join(os.path.dirname(__file__), '..', 'mbpol_openmm_plugin_tpu')
ff = dict(np.load(os.path.join(from_dir, 'data', 'forcefield.npz')))

flat = lambda a: ',\n        '.join('%.8e' % v for v in np.asarray(a).reshape(-1))

HEADER = f"""    <AtomTypes>
        <Type name="MBPol-O" class="O" element="O" mass="{ff['mass_O']}"/>
        <Type name="MBPol-H" class="H" element="H" mass="{ff['mass_H']}"/>
        <Type name="MBPol-M" class="M" mass="{ff['mass_M']}"/>
        <Type name="MBPol-Cl" class="CL" element="CL" mass="{ff['mass_Cl']}"/>
    </AtomTypes>
    <Residues>
        <Residue name="HOH">
            <Atom name="O" type="MBPol-O" />
            <Atom name="H1" type="MBPol-H" />
            <Atom name="H2" type="MBPol-H" />
            <Atom name="M" type="MBPol-M" />
            <VirtualSite type="average3" index="3" atom1="0" atom2="1" atom3="2" weight1="{ff['vsite_weights'][0]:.9f}" weight2="{ff['vsite_weights'][1]:.9f}" weight3="{ff['vsite_weights'][2]:.9f}" />
            <Bond from="0" to="1" />
            <Bond from="0" to="2" />
        </Residue>
        <Residue name="Cl">
            <Atom name="Cl" type="MBPol-Cl" />
        </Residue>
    </Residues>"""


def elec_block(include_charge_redistribution=True):
    toggle = ('' if include_charge_redistribution else
              '\n        <setIncludeChargeRedistribution chargeRedistribution="False"/>')
    return f"""    <MBPolElectrostaticsForce thole-charge-charge="{ff['thole'][0]}" thole-charge-dipole="{ff['thole'][1]}" thole-dipole-dipole="{ff['thole'][2]}" thole-dipole-dipole-singlebond="{ff['thole'][3]}">
        <Residue name="HOH" class1="O" class2="H" class3="H" />
        <Atom type="MBPol-O" charge="{ff['atom_O'][0]:.7e}" damping-factor="{ff['atom_O'][1]}" polarizability="{ff['atom_O'][2]}" />
        <Atom type="MBPol-H" charge="{ff['atom_H'][0]:.7e}" damping-factor="{ff['atom_H'][1]}" polarizability="{ff['atom_H'][2]}" />
        <Atom type="MBPol-M" charge="{ff['atom_M'][0]:g}" damping-factor="{ff['atom_M'][1]}" polarizability="{ff['atom_M'][2]:g}" />{toggle}
    </MBPolElectrostaticsForce>"""


BODY_FORCES = f"""    <MBPolOneBodyForce>
        <Residue name="HOH" class1="O" class2="H" class3="H" />
    </MBPolOneBodyForce>
    <MBPolTwoBodyForce cutoff_nm="{ff['cutoff_2b']}">
        <Residue name="HOH" class1="O" class2="H" class3="H" />
    </MBPolTwoBodyForce>
    <MBPolThreeBodyForce cutoff_nm="{ff['cutoff_3b']}">
        <Residue name="HOH" class1="O" class2="H" class3="H" />
    </MBPolThreeBodyForce>"""

SCRIPT = f"""    <Script>
# TT6-damped dispersion over atom classes O/H/M/Cl; evaluated natively by
# mbpol_openmm_plugin_tpu.models.dispersion (tables parsed from this text).
C6table = [
        {flat(ff['C6'])}
] # kJ/(nm**6 mol), class order O,H,M,Cl

d6table = [
        {flat(ff['d6'])}
] # nm**-1
    </Script>"""


def write(name, comment, *blocks):
    out = os.path.join(from_dir, 'app', name)
    with open(out, 'w') as f:
        f.write('<ForceField>\n    <!-- %s -->\n' % comment
                + '\n'.join(blocks) + '\n</ForceField>\n')
    print('wrote', out)


write('mbpol.xml',
      'regenerated from the extracted MB-pol parameter tables\n'
      '         (tools/emit_xml.py); numerically identical to the '
      "reference's\n         python/mbpol.xml",
      HEADER, elec_block(True), BODY_FORCES, SCRIPT)

write('mbpol_no_custom_dispersion_no_charge_redistribution.xml',
      'variant: dispersion script removed, charge redistribution disabled\n'
      '         (tools/emit_xml.py; reference python/'
      'mbpol_no_custom_dispersion_no_charge_redistribution.xml)',
      HEADER, elec_block(False), BODY_FORCES)

write('customdispersion.xml',
      'variant: dispersion-only force field (tools/emit_xml.py;\n'
      '         reference python/customdispersion.xml)',
      HEADER, SCRIPT)
