#!/usr/bin/env python3
"""One-shot deterministic generator for the IRS-990 XML test corpus
(FIXTURES.md §B). Output is committed; re-running must be byte-identical.

City vocabulary comes from the reference repo's own sample output
(README.md:42-58), including the typo'd 'berkelrey' which that sample shows
is NOT normalized. Mixed case makes the lower() projection observable;
duplicates make counts > 1. filing_compact.xml (no whitespace) and
filing_empty_elem.xml (self-closing element) are the two formats the
reference mishandles (SURVEY §1.3) and our engine must NOT drop.
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "irs990")

CITIES = [
    "BERKELEY", "Berkeley", "berkelrey", "Fort Washington",
    "FORT WASHINGTON", "Madison", "madison", "MADISON", "Fayetteville",
    "Cary", "Raleigh", "raleigh", "Glenside", "Shoreline", "Athens",
    "athens", "Florham Park", "Berkeley",
]

TEMPLATE = """<?xml version="1.0"?>
<Return xmlns="http://www.irs.gov/efile">
  <ReturnHeader>
    <Filer>
      <EIN>{ein}</EIN>
      <BusinessName>
        <BusinessNameLine1Txt>NONPROFIT {i:04d}</BusinessNameLine1Txt>
      </BusinessName>
      <USAddress>
        <AddressLine1Txt>{i} MAIN ST</AddressLine1Txt>
        <CityNm>{city}</CityNm>
        <StateAbbreviationCd>CA</StateAbbreviationCd>
        <ZIPCd>947{i:02d}</ZIPCd>
      </USAddress>
    </Filer>
  </ReturnHeader>
  <ReturnData>
    <IRS990>
      <TotalRevenueAmt>{rev}</TotalRevenueAmt>
    </IRS990>
  </ReturnData>
</Return>
"""


def main():
    os.makedirs(OUT, exist_ok=True)
    names = []
    for i, city in enumerate(CITIES, start=1):
        name = f"filing_{i:04d}.xml"
        with open(os.path.join(OUT, name), "w") as f:
            f.write(TEMPLATE.format(i=i, ein=943000000 + i, city=city,
                                    rev=100000 + i * 1111))
        names.append(name)

    # compact: one line, zero inter-element whitespace (crashes the
    # reference's elem.text.strip(); must work in ours)
    compact = ('<?xml version="1.0"?>'
               '<Return xmlns="http://www.irs.gov/efile"><ReturnHeader>'
               '<Filer><EIN>943000099</EIN><USAddress><CityNm>CARY</CityNm>'
               '<ZIPCd>94799</ZIPCd></USAddress></Filer></ReturnHeader>'
               '<ReturnData><IRS990><TotalRevenueAmt>555555</TotalRevenueAmt>'
               '</IRS990></ReturnData></Return>')
    with open(os.path.join(OUT, "filing_compact.xml"), "w") as f:
        f.write(compact)
    names.append("filing_compact.xml")

    # self-closing element (elem.text is None in the reference → crash)
    empty_elem = TEMPLATE.format(i=98, ein=943000098, city="Shoreline",
                                 rev=777777).replace(
        "  <ReturnData>",
        "  <PreparerFirmGrp/>\n  <ReturnData>")
    with open(os.path.join(OUT, "filing_empty_elem.xml"), "w") as f:
        f.write(empty_elem)
    names.append("filing_empty_elem.xml")

    with open(os.path.join(OUT, "bad_not_xml.txt"), "w") as f:
        f.write("this is not xml\n<<<garbage>>>\n")
    names.append("bad_not_xml.txt")

    with open(os.path.join(OUT, "manifest.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    print(f"wrote {len(names)} corpus files + manifest to {OUT}")


if __name__ == "__main__":
    main()
